// ANN-decade soak, round 11 second leg: the PQ family at 10M vectors —
// one decade past the r10/r11 1M legs, the corpus the r8 IVF leg ran.
// Claims under test:
//  - buildPqIndex holds at 10M: bounded trainings (maxTrain ∝ nlist,
//    corpus-independent) + ONE assign+encode pass; the codes table
//    stays ~3% of corpus bytes (the 8 B/vector claim, now measured as
//    an on-disk artifact via savePqIndex);
//  - pqQuery batch cost stays ~nprobe/nlist of a codes scan — at 10M
//    the probed slice is 10M·nprobe/1024 rows, NOT 10M·64 floats;
//  - the saved index round-trips at the decade: loadPqIndex in a
//    fresh-session shape (same JVM here; the cluster_verify leg covers
//    multi-JVM) answers bit-identically;
//  - recall at 10M vs exact stays in the honest r10 regime (this
//    fixture is i.i.d.-ish — the PQ worst case; production corpora
//    cluster and do better).
// Fixture: tmp/sf_ann10m (gen_sf1.py, 5000 rotation+sign-flip copies
// of sf0.1's 2000 vectors — all bitwise distinct).
//
// Run (box otherwise idle, inside tmux):
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 48g \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=64 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/ann_soak_pq10m.scala
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

spark.sparkContext.setLogLevel("WARN")
val dir = sys.env.getOrElse("ANN_DIR", "/root/repo/tmp/sf_ann10m")
val idxDir = "/root/repo/tmp/pqidx10m"

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"$label%-42s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
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

// exact baseline for recall
var bf: org.apache.spark.sql.DataFrame = null
time("x08_bruteforce_10m") { bf = mat(Similarity.bruteForceTopK(t)) }

// --- build ONCE at production knobs (the r8 10M IVF discipline:
// nlist=1024, maxTrain=40·nlist — corpus-independent) ---
var idx: Similarity.PqIndex = null
time("buildPqIndex_nlist1024") {
  idx = Similarity.buildPqIndex(t, nlist = 1024, maxTrain = 40960)
  idx.codes.count()
}
println("codes rows=" + idx.codes.count())

// --- persist the artifact; measure its footprint vs the raw corpus ---
time("savePqIndex") { Similarity.savePqIndex(idx, idxDir) }
def duBytes(p: String): Long = {
  val d = new java.io.File(p)
  if (d.isFile) d.length
  else Option(d.listFiles).map(_.map(f => duBytes(f.getPath)).sum).getOrElse(0L)
}
println(f"codes artifact MB=${duBytes(s"$idxDir/codes") / 1e6}%.0f  raw corpus MB=${duBytes(s"$dir/embeddings.parquet") / 1e6}%.0f")

// --- query batches against the BUILT index ---
val q1 = t.embeddings.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding").as("qe"))
var adc8: org.apache.spark.sql.DataFrame = null
time("pqQuery_batch1_k10_nprobe8") { adc8 = mat(Similarity.pqQuery(idx, q1, k = 10, nprobe = 8)) }
var adc32: org.apache.spark.sql.DataFrame = null
time("pqQuery_batch1_k10_nprobe32") { adc32 = mat(Similarity.pqQuery(idx, q1, k = 10, nprobe = 32)) }
println(f"pqQuery recall@10 vs exact (np=8):  ${recallVs(bf, adc8, 100.0)}%.2f")
println(f"pqQuery recall@10 vs exact (np=32): ${recallVs(bf, adc32, 100.0)}%.2f")

// a SECOND, different batch reuses the same index
val q2 = t.embeddings.filter(col("vec_id") % 1000000L === 7L).select(col("vec_id").as("qid"), col("embedding").as("qe"))
println("batch2 queries=" + q2.count())
time("pqQuery_batch2_k10_nprobe32") { Similarity.pqQuery(idx, q2, k = 10, nprobe = 32).write.format("noop").mode("overwrite").save() }

// --- exact re-rank at the decade ---
var rr: org.apache.spark.sql.DataFrame = null
time("pqQuery_rerank_sl400_nprobe32") { rr = mat(Similarity.pqQuery(idx, q1, k = 10, nprobe = 32, rerankShortlist = 400)) }
println(f"pqQuery+rerank recall@10 vs exact:  ${recallVs(bf, rr, 100.0)}%.2f")

// --- the saved artifact answers bit-identically after a reload ---
var loaded: Similarity.PqIndex = null
time("loadPqIndex") { loaded = Similarity.loadPqIndex(spark, idxDir, t.embeddings.select(col("vec_id"), col("embedding"))) }
var rrL: org.apache.spark.sql.DataFrame = null
time("pqQuery_rerank_loaded") { rrL = mat(Similarity.pqQuery(loaded, q1, k = 10, nprobe = 32, rerankShortlist = 400)) }
println("loaded == built rows: " + (rrL.exceptAll(rr).count() == 0 && rr.exceptAll(rrL).count() == 0))

loaded.release()
idx.release()
sys.exit(0)
