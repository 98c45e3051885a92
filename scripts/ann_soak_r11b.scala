// ANN-decade soak, round 11 third leg: the PACKED PQ index + absorbDelta
// at 10M vectors. Claims under test:
//  - the nibble-packed codes table (one int replacing array<int>, this
//    round's change) cuts the on-disk artifact ~4x from the 12.3%-of-
//    corpus figure the second leg recorded, with build/query walls no
//    worse than the array form's (same leg, same knobs, same fixture);
//  - absorbDelta(PqIndex) is O(delta): folding a 1M delta into a 9M
//    index costs ~1/10 of the 10M build (only the delta runs the coarse
//    argmax + encode), and the absorbed index answers queries that hit
//    both halves;
//  - the packed artifact still round-trips bit-identically.
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
//     -I scripts/ann_soak_r11b.scala
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

spark.sparkContext.setLogLevel("WARN")
val dir = sys.env.getOrElse("ANN_DIR", "/root/repo/tmp/sf_ann10m")
val idxDir = "/root/repo/tmp/pqidx10m_packed"

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"$label%-42s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  r
}
def mat(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
  val c = df.persist(); c.count(); c
}

val t = Tables(spark, dir)
val emb = t.embeddings.select(col("vec_id"), col("embedding"))
println("vectors=" + emb.count())

// --- full build at production knobs (identical to the second leg) ---
var idx: Similarity.PqIndex = null
time("buildPqIndex_10m_nlist1024") {
  idx = Similarity.buildPqIndex(t, nlist = 1024, maxTrain = 40960)
  idx.codes.count()
}
println("codes schema=" + idx.codes.schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(","))

// --- packed artifact footprint vs raw corpus and vs the r11 array form ---
time("savePqIndex_packed") { Similarity.savePqIndex(idx, idxDir) }
def duBytes(p: String): Long = {
  val d = new java.io.File(p)
  if (d.isFile) d.length
  else Option(d.listFiles).map(_.map(f => duBytes(f.getPath)).sum).getOrElse(0L)
}
val codesMb = duBytes(s"$idxDir/codes") / 1e6
val rawMb = duBytes(s"$dir/embeddings.parquet") / 1e6
println(f"packed codes artifact MB=$codesMb%.0f  raw corpus MB=$rawMb%.0f  ratio=${codesMb / rawMb}%.3f")

// --- query walls at the decade (same batches as the second leg) ---
val q1 = emb.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding").as("qe"))
time("pqQuery_k10_nprobe32") { Similarity.pqQuery(idx, q1, k = 10, nprobe = 32).write.format("noop").mode("overwrite").save() }
time("pqQuery_rerank_sl400_np32") { Similarity.pqQuery(idx, q1, k = 10, nprobe = 32, rerankShortlist = 400).write.format("noop").mode("overwrite").save() }

// --- saved packed artifact answers bit-identically after reload ---
var rr: org.apache.spark.sql.DataFrame = null
time("pqQuery_rerank_built") { rr = mat(Similarity.pqQuery(idx, q1, k = 10, nprobe = 32, rerankShortlist = 400)) }
var loaded: Similarity.PqIndex = null
time("loadPqIndex_packed") { loaded = Similarity.loadPqIndex(spark, idxDir, emb) }
var rrL: org.apache.spark.sql.DataFrame = null
time("pqQuery_rerank_loaded") { rrL = mat(Similarity.pqQuery(loaded, q1, k = 10, nprobe = 32, rerankShortlist = 400)) }
println("loaded == built rows: " + (rrL.exceptAll(rr).count() == 0 && rr.exceptAll(rrL).count() == 0))
loaded.release()
idx.release()

// --- absorbDelta: 9M base + 1M delta vs the 10M build above ---
val base = emb.filter(col("vec_id") < 9000000L)
val delta = emb.filter(col("vec_id") >= 9000000L)
println("base=" + base.count() + " delta=" + delta.count())
var baseIdx: Similarity.PqIndex = null
time("buildPqIndex_9m_base") {
  baseIdx = Similarity.buildPqIndexFrom(base, nlist = 1024, maxTrain = 40960, tag = "absorb9m")
  baseIdx.codes.count()
}
var grown: Similarity.PqIndex = null
time("absorbDelta_1m") {
  grown = Similarity.absorbDelta(baseIdx, delta)
  grown.codes.count()
}
println("grown rows=" + grown.codes.count())
// a query equal to a DELTA vector must surface it via exact re-rank
val probe = delta.orderBy("vec_id").limit(1).collect()(0)
val qd = Seq((-1L, probe.getSeq[Float](1).toArray)).toDF("qid", "qe")
val hit = Similarity.pqQuery(grown, qd, k = 1, nprobe = 32, rerankShortlist = 400).collect()(0)
println("delta hit: vec_id=" + hit.getLong(1) + " cos=" + hit.getDouble(2) +
  " (expected " + probe.getLong(0) + ", 1.0)")
grown.release()
baseIdx.release()
sys.exit(0)
