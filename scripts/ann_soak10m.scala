// ANN-decade soak, second leg (round 8): 10,000,000 vectors — 10x the
// 1M leg, 5000x the sf0.1 gate. Claims under test:
//  - x09's width knob holds another decade: 4x24-bit bands saturate
//    (expected in-bucket collisions ~4*C(n,2)/2^24 goes quadratic past
//    ~10^7), 4x32 is the decade's setting — both measured;
//  - x14 IVF keeps bounded training + ~nprobe/nlist probe cost and
//    useful recall@10 at production knobs (nlist=1024);
//  - x17/x33: the SemDeDup in-cell pairwise budget Σ C(|cell|,2) ≈
//    n²/(2·nlist) forces nlist to scale WITH the corpus; training
//    stays bounded (maxTrain ∝ nlist, corpus-independent).
// Fixture: tmp/sf_ann10m (gen_sf1.py, 5000 rotation+sign-flip copies
// of sf0.1's 2000 vectors — all distinct: rotations are unique within
// a 64-copy block, per-block sign patterns differ across blocks).
//
// Run (box otherwise idle, inside tmux):
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 48g \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=64 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/ann_soak10m.scala
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

spark.sparkContext.setLogLevel("WARN")
val dir = sys.env.getOrElse("ANN_DIR", "/root/repo/tmp/sf_ann10m")
val quarterDir = "/root/repo/tmp/sf_ann_2m5"

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

// quarter cut for in-session growth factors
t.embeddings.filter(col("vec_id") < 2500000)
  .write.mode("overwrite").parquet(s"$quarterDir/embeddings.parquet")
val tq = Tables(spark, quarterDir)
println("quarter=" + tq.embeddings.count())

// --- x09 band widths: candidate volume (threshold=-1 keeps every
// verified candidate) at 24-bit and 32-bit bands, quarter vs full ---
val c24q = time("x09_cand_2.5m_4x24") {
  Similarity.cosineNearDup(tq, threshold = -1.0, bandBits = 24).count()
}
val c24f = time("x09_cand_10m_4x24") {
  Similarity.cosineNearDup(t, threshold = -1.0, bandBits = 24).count()
}
println(f"x09 4x24 growth for 4x vectors: ${c24f.toDouble / c24q}%.2fx" +
  f" (near-linear=4x); per-vector at 10m: ${c24f / 1e7}%.4f")
val c32q = time("x09_cand_2.5m_4x32") {
  Similarity.cosineNearDup(tq, threshold = -1.0, bandBits = 32).count()
}
val c32f = time("x09_cand_10m_4x32") {
  Similarity.cosineNearDup(t, threshold = -1.0, bandBits = 32).count()
}
println(f"x09 4x32 growth for 4x vectors: ${c32f.toDouble / c32q}%.2fx; " +
  f"candidates at 10m: $c32f")
val nd = time("x09_neardup_0.9_10m_4x32") {
  Similarity.cosineNearDup(t, threshold = 0.9, bandBits = 32).count()
}
println(s"x09 pairs >= 0.9 at 10m (4x32): $nd")

// --- exact brute-force baseline: 10 queries x 10M cosines ---
val bf = Similarity.bruteForceTopK(t)
time("x08_bruteforce_10m") { noop(bf) }

// --- x14 IVF at 10M-production knobs: nlist=1024 (cells ~10k),
// nprobe=8 (~0.8% of the corpus scored/query), train 40/cell bounded ---
val ivf = Similarity.ivfTopK(t, nlist = 1024, nprobe = 8, maxTrain = 40960)
time("x14_ivf_10m_total") { noop(ivf) }
val hit = bf.select("qid", "vec_id").intersect(ivf.select("qid", "vec_id")).count()
println(f"x14 recall@10 (nlist=1024, nprobe=8): ${hit / 100.0}%.2f")
val ivf32 = Similarity.ivfTopK(t, nlist = 1024, nprobe = 32, maxTrain = 40960)
val hit32 = bf.select("qid", "vec_id").intersect(ivf32.select("qid", "vec_id")).count()
println(f"x14 recall@10 (nlist=1024, nprobe=32): ${hit32 / 100.0}%.2f")

// --- x17 cell balance at nlist=1024 ---
val cells = time("x17_kmeans_cells_10m") {
  Similarity.kmeansCells(t, nlist = 1024, maxTrain = 40960)
    .select(col("cell"), col("n"))
    .agg(max("n").as("max_cell"), avg("n").as("avg_cell"),
      sum(col("n") * (col("n") - 1) / 2).as("pairwise_budget"))
    .collect()(0)
}
println(s"x17 cells (nlist=1024): max=${cells.get(0)} avg=${cells.get(1)} " +
  s"semdedup_pairwise_budget=${cells.get(2)}")

// --- x33 SemDeDup: nlist must scale with the corpus to bound the
// in-cell sweep (n²/(2·nlist) ≈ 6e9 at nlist=8192) — the knob's
// decade setting, training still bounded (5/cell here) ---
val dups = time("x33_semdedup_10m_nlist8192") {
  Similarity.semanticDedup(t, threshold = 0.95, nlist = 8192,
    maxTrain = 40960).filter(col("is_dup")).count()
}
println(s"x33 dups >= 0.95 at 10m: $dups")
sys.exit(0)
