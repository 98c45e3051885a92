// ANN-decade soak (round 8): the embedding/similarity pipeline at
// 1,000,000 vectors — 5x the 500k-doc corpus soak's embedding table,
// 500x the sf0.1 gate. Claims under test:
//  - x09 hyperplane-LSH candidate volume stays near-linear as the
//    2^16-bucket band space fills (avg bucket ~15 at 1M — the regime
//    where Σ bucket² starts to matter);
//  - x14 IVF trains on a bounded sample regardless of corpus size,
//    probes ~nprobe/nlist of the corpus, and still lands useful
//    recall@10 against the exact brute-force baseline ON THE SAME
//    QUERIES;
//  - x17/x33 cell-size distribution (the SemDeDup per-cell pairwise
//    budget) stays balanced enough that Σ|cell|² is tractable at the
//    production cluster counts the nlist knob implies.
// Fixtures: tmp/sf_ann (gen_sf1.py, 500 rotation+sign-flip copies of
// sf0.1's 2000 vectors — all 1M bitwise distinct, verified at gen).
//
// Run (box otherwise idle):
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 16g \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/ann_soak.scala
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

spark.sparkContext.setLogLevel("WARN")
val dir = sys.env.getOrElse("ANN_DIR", "/root/repo/tmp/sf_ann")
val quarterDir = "/root/repo/tmp/sf_ann_250k"

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  r
}
def noop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()

val t = Tables(spark, dir)
println("vectors=" + t.embeddings.count())

// quarter-scale cut for growth factors (first 125 copies)
t.embeddings.filter(col("vec_id") < 250000)
  .write.mode("overwrite").parquet(s"$quarterDir/embeddings.parquet")
val tq = Tables(spark, quarterDir)
println("quarter=" + tq.embeddings.count())

// --- x09 banded near-dup: candidate volume (threshold = -1 keeps every
// verified candidate, so the row count IS the post-distinct candidate
// volume). Leg 1 of this soak measured the GATE banding (4x16) at
// 250k/1M: 3.7e6 -> 6.0e7 candidates, 15.96x for 4x vectors — the
// 2^16 band space saturates (avg bucket 1M/65536 ≈ 15, Σ C(bucket,2)
// quadratic). The fix is the width knob: 4x24-bit bands (2^24
// buckets/band) keep expected candidates ≈ 4·C(n,2)/2^24 — linear
// through ~10^7 vectors, with 4x32 the next decade's setting. Both
// widths measured here. ---
val cand250w = time("x09_cand_250k_4x24") {
  Similarity.cosineNearDup(tq, threshold = -1.0, bandBits = 24).count()
}
val cand1mw = time("x09_cand_1m_4x24") {
  Similarity.cosineNearDup(t, threshold = -1.0, bandBits = 24).count()
}
println(f"x09 4x24 candidate growth for 4x vectors: ${cand1mw.toDouble / cand250w}%.2fx" +
  f" (near-linear=4x); per-vector at 1m: ${cand1mw / 1e6}%.4f")
val nd1m = time("x09_neardup_0.9_1m_4x24") {
  Similarity.cosineNearDup(t, threshold = 0.9, bandBits = 24).count()
}
println(s"x09 pairs >= 0.9 at 1m: $nd1m")

// --- exact brute-force baseline: 10 queries x 1M cosines ---
val bf = Similarity.bruteForceTopK(t)
time("x08_bruteforce_1m") { noop(bf) }

// --- x14 IVF at production-ish knobs: nlist=256 (cells ~3.9k),
// nprobe=8 (~3% of the corpus scored per query), bounded 20k train ---
val ivf = Similarity.ivfTopK(t, nlist = 256, nprobe = 8, maxTrain = 20000)
time("x14_ivf_1m_total") { noop(ivf) }
// recall@10 against the exact baseline on the same queries
val hit = bf.select("qid", "vec_id").intersect(ivf.select("qid", "vec_id")).count()
println(f"x14 recall@10 (nlist=256, nprobe=8): ${hit / 100.0}%.2f")
val ivf16 = Similarity.ivfTopK(t, nlist = 256, nprobe = 16, maxTrain = 20000)
val hit16 = bf.select("qid", "vec_id").intersect(ivf16.select("qid", "vec_id")).count()
println(f"x14 recall@10 (nlist=256, nprobe=16): ${hit16 / 100.0}%.2f")

// --- x17 cell balance at nlist=256: the SemDeDup pairwise budget is
// sum over cells of C(|cell|,2) — skew turns the knob into a wall ---
val cells = time("x17_kmeans_cells_1m") {
  Similarity.kmeansCells(t, nlist = 256, maxTrain = 20000)
    .select(col("cell"), col("n"))
    .agg(max("n").as("max_cell"), avg("n").as("avg_cell"),
      sum(col("n") * (col("n") - 1) / 2).as("pairwise_budget"))
    .collect()(0)
}
println(s"x17 cells: max=${cells.get(0)} avg=${cells.get(1)} " +
  s"semdedup_pairwise_budget=${cells.get(2)}")

// --- x33 SemDeDup at nlist=1024 (cells ~1k -> ~5e8 in-cell pairs):
// the within-cell near-dup sweep at the knob setting a 1M corpus needs ---
val dups = time("x33_semdedup_1m_nlist1024") {
  Similarity.semanticDedup(t, threshold = 0.95, nlist = 1024,
    maxTrain = 20000).filter(col("is_dup")).count()
}
println(s"x33 dups >= 0.95 at 1m: $dups")
sys.exit(0)
