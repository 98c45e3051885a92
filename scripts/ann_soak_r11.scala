// ANN-decade soak, round 11: the build-once IVF-PQ index at the 1M
// decade — r10 verdict items 1 and 2. Claims under test:
//  - buildPqIndex pays the two bounded-sample trainings + ONE
//    assign+encode corpus pass into a persisted 8 B/vector codes
//    table; r10's per-call x61 (19.1 s, coarse-argmax-dominated) was
//    paying that on EVERY query call;
//  - pqQuery batches against the built index cost only the probed
//    ADC scan + top-k — and a SECOND batch pays the same, proving the
//    amortization (nothing retrains, nothing re-encodes);
//  - the shipped ivfPqRerankTopK (now exactly build + pqQuery(rerank)
//    + release) reproduces the r10 inline-recipe recall recovery
//    (raw ADC 0.01 -> ~0.22 @ shortlist=400, nprobe=32) as the
//    OPERATOR, not a hand-assembled join — closing x62's soak gap;
//  - pqQuery(rerank) on the prebuilt index emits bit-identical rows
//    to the per-call operator (same trained state, same plan shape).
// Fixture: tmp/sf_ann (1M bitwise-distinct 64-d vectors).
//
// Run (box otherwise idle):
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/ann_soak_r11.scala
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

spark.sparkContext.setLogLevel("WARN")
val dir = sys.env.getOrElse("ANN_DIR", "/root/repo/tmp/sf_ann")

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  r
}
def mat(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
  val c = df.persist(); c.count(); c
}
def recallVs(base: org.apache.spark.sql.DataFrame,
             approx: org.apache.spark.sql.DataFrame, n: Double): Double =
  base.select("qid", "vec_id").intersect(approx.select("qid", "vec_id")).count() / n

val t = Tables(spark, dir)
println("vectors=" + t.embeddings.count())

// exact baseline for recall (same as r10's x08 leg)
var bf: org.apache.spark.sql.DataFrame = null
time("x08_bruteforce_1m") { bf = mat(Similarity.bruteForceTopK(t)) }

// --- build ONCE: trainings + assign/encode pass + persist ---
var idx: Similarity.PqIndex = null
time("buildPqIndex_nlist256") {
  idx = Similarity.buildPqIndex(t, nlist = 256, maxTrain = 20000)
  idx.codes.count() // materialize the persisted codes table
}
println("codes rows=" + idx.codes.count())

// --- query batches against the BUILT index: the amortized cost ---
val q1 = t.embeddings.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding").as("qe"))
var adc8: org.apache.spark.sql.DataFrame = null
time("pqQuery_batch1_k10_nprobe8") { adc8 = mat(Similarity.pqQuery(idx, q1, k = 10, nprobe = 8)) }
var adc16: org.apache.spark.sql.DataFrame = null
time("pqQuery_batch1_k10_nprobe16") { adc16 = mat(Similarity.pqQuery(idx, q1, k = 10, nprobe = 16)) }
println(f"pqQuery recall@10 vs exact (np=8):  ${recallVs(bf, adc8, 100.0)}%.2f")
println(f"pqQuery recall@10 vs exact (np=16): ${recallVs(bf, adc16, 100.0)}%.2f")

// a SECOND, different batch reuses the same index — no retrain/encode
val q2 = t.embeddings.filter(col("vec_id") % 100000L === 7L).select(col("vec_id").as("qid"), col("embedding").as("qe"))
println("batch2 queries=" + q2.count())
time("pqQuery_batch2_k10_nprobe16") { Similarity.pqQuery(idx, q2, k = 10, nprobe = 16).write.format("noop").mode("overwrite").save() }

// --- exact re-rank on the built index: the x62 recipe as one call ---
var rr: org.apache.spark.sql.DataFrame = null
time("pqQuery_rerank_sl400_nprobe32") { rr = mat(Similarity.pqQuery(idx, q1, k = 10, nprobe = 32, rerankShortlist = 400)) }
println(f"pqQuery+rerank recall@10 vs exact:  ${recallVs(bf, rr, 100.0)}%.2f")

// --- the SHIPPED per-call operator (x62's gate form): build + query +
// release inside — its cost is the un-amortized ceiling, its rows must
// equal the prebuilt-index answer (same trained state) ---
var rrOp: org.apache.spark.sql.DataFrame = null
time("ivfPqRerankTopK_shipped_percall") { rrOp = mat(Similarity.ivfPqRerankTopK(t, k = 10, shortlist = 400, nlist = 256, nprobe = 32, maxTrain = 20000)) }
println(f"shipped operator recall@10 vs exact: ${recallVs(bf, rrOp, 100.0)}%.2f")
println("shipped == prebuilt-index rows: " + (rrOp.exceptAll(rr).count() == 0 && rr.exceptAll(rrOp).count() == 0))

idx.release()
sys.exit(0)
