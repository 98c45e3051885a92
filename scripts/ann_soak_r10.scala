// ANN-decade soak, round 10: the PQ family (x60 ADC, x61 IVF-PQ) and
// the media-ANN path (x59) at the 1M decade — the r9 verdict's gap:
// both landed late in r9 with gate-scale (<=20k vector) evidence only.
// Claims under test:
//  - x60 PQ-ADC: the encode pass is one narrow projection (8 codes out
//    per vector), the LUT broadcast is bounded by the query count, the
//    ADC scan + per-query top-k ride WindowGroupLimit, and recall@10
//    against the exact brute-force baseline is useful despite 8 B/vec;
//  - x61 IVF-PQ: the coarse router cuts the ADC scan to ~nprobe/nlist
//    of the corpus with bounded extra recall loss vs x60's full scan;
//  - x59 media-ANN: featurize -> index build -> query batch at 1.25M
//    media items (sf25_corpus docs as opaque binary payloads), all
//    through the public build-once index API.
// Fixtures: tmp/sf_ann (gen_sf1.py, 500 rotation+sign-flip copies of
// sf0.1's 2000 vectors — 1M bitwise-distinct); tmp/sf25_corpus (1.25M
// docs, bag-identical token-shuffled copies).
//
// Run (box otherwise idle):
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/ann_soak_r10.scala
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Multimodal, Similarity}

spark.sparkContext.setLogLevel("WARN")
val dir = sys.env.getOrElse("ANN_DIR", "/root/repo/tmp/sf_ann")

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"$label%-32s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  r
}
def noop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()
def recallVs(base: org.apache.spark.sql.DataFrame,
             approx: org.apache.spark.sql.DataFrame, n: Double): Double =
  base.select("qid", "vec_id").intersect(approx.select("qid", "vec_id")).count() / n

val t = Tables(spark, dir)
println("vectors=" + t.embeddings.count())

// --- exact brute-force baseline: 10 queries x 1M cosines ---
def mat(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
  // top-k outputs are ~100 rows — persist so the recall intersects
  // below read the cached result instead of re-executing the plan
  val c = df.persist(); c.count(); c
}
var bf: org.apache.spark.sql.DataFrame = null
time("x08_bruteforce_1m") { bf = mat(Similarity.bruteForceTopK(t)) }

// --- x60 full-corpus PQ-ADC at 1M: train (bounded 20k sample), encode
// (narrow 8-codes-per-vector pass), LUT broadcast, ADC scan + top-k ---
val pq0 = Similarity.pqAdcTopK(t)
println("x60 WindowGroupLimit in plan: " + pq0.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
var pq: org.apache.spark.sql.DataFrame = null
time("x60_pq_adc_1m_total") { pq = mat(pq0) }
println(f"x60 recall@10 vs exact: ${recallVs(bf, pq, 100.0)}%.2f")

// --- x61 IVF-PQ at production-ish knobs: the ADC scan cut to the
// probed sliver; recall cost of the router measured against BOTH the
// exact baseline and x60's full ADC scan ---
var ivfpq8: org.apache.spark.sql.DataFrame = null
time("x61_ivfpq_1m_nprobe8") { ivfpq8 = mat(Similarity.ivfPqTopK(t, nlist = 256, nprobe = 8, maxTrain = 20000)) }
println(f"x61 recall@10 vs exact  (nprobe=8):  ${recallVs(bf, ivfpq8, 100.0)}%.2f")
println(f"x61 agreement@10 vs x60 (nprobe=8):  ${recallVs(pq, ivfpq8, 100.0)}%.2f")
var ivfpq16: org.apache.spark.sql.DataFrame = null
time("x61_ivfpq_1m_nprobe16") { ivfpq16 = mat(Similarity.ivfPqTopK(t, nlist = 256, nprobe = 16, maxTrain = 20000)) }
println(f"x61 recall@10 vs exact  (nprobe=16): ${recallVs(bf, ivfpq16, 100.0)}%.2f")
println(f"x61 agreement@10 vs x60 (nprobe=16): ${recallVs(pq, ivfpq16, 100.0)}%.2f")

// --- x14 exact-scoring IVF at the same knobs, for the family table ---
var ivf16: org.apache.spark.sql.DataFrame = null
time("x14_ivf_1m_nprobe16") { ivf16 = mat(Similarity.ivfTopK(t, nlist = 256, nprobe = 16, maxTrain = 20000)) }
println(f"x14 recall@10 vs exact  (nprobe=16): ${recallVs(bf, ivf16, 100.0)}%.2f")

// --- x59 media-ANN at 1.25M media items: documents as opaque binary,
// byte-histogram featurizer (the sanctioned codec seam), build-once
// index via the public API, 126-query batch at nprobe=8 ---
val tm = Tables(spark, "/root/repo/tmp/sf25_corpus")
val media = tm.documents.select(
  col("doc_id").as("media_id"),
  lit("text/plain").as("media_type"),
  col("text").cast("binary").as("bytes"),
  lit(null).cast(Multimodal.mediaSchema("meta").dataType).as("meta"))
println("media items=" + media.count())
val feats = Multimodal.extractFeatures(graft.core.Fanout.widen(media), 32)
val emb59 = feats.select(
  col("media_id").as("vec_id"), col("feature").as("embedding"))
time("x59_featurize_1.25m") { noop(emb59) }
val idx = time("x59_index_build_nlist64") {
  val i = Similarity.buildIvfIndexFrom(emb59, nlist = 64, seed = 42L,
    maxTrain = 20000, tag = "media1m")
  i.assigned.count() // materialize the persisted index
  i
}
// one statement: a leading-dot continuation line splits under the
// REPL's -I statement parser (the r9 delta-stream lesson) and silently
// drops the projection
val q59 = idx.assigned.filter(col("vec_id") % 10000L === 0).select(col("vec_id").as("qid"), col("embedding").as("qe"))
println("x59 query batch=" + q59.count())
val out59 = Similarity.ivfQuery(idx, q59, k = 5, nprobe = 8)
time("x59_query_batch_k5_nprobe8") { noop(out59) }
idx.release()
sys.exit(0)
