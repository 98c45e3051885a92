// Corpus soak, round-9 part 2 (post-refactor): the legs the one-block
// r9 script lost when x30-plain-at-12M hit the box's scratch wall and
// aborted the whole block. Each leg is its OWN top-level statement so
// a DNF is recorded, not propagated.
//
// Already measured this session (tmp/soak_r9e.log, post-refactor):
//   x30 plain  5M p64: 426.6 s, min free 57.5 GB (r8: 478 s at ~80 GB peak)
//   x30 STAGED 5M p64: 288.2 s, min free 64.9 GB
//   x30 plain 12M p64: DNF disk-full (>83 GB) — the remaining plain wall;
//     the refactor moved the boundary from 5M to somewhere in (5M, 12M].
//
// Run:
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 48g \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=64 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/corpus_soak_r9b.scala
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.TextQueries

spark.sparkContext.setLogLevel("WARN")

val minFree = new java.util.concurrent.atomic.AtomicLong(Long.MaxValue)
val mon = new Thread(() => while (true) {
  val f = new java.io.File("/tmp").getUsableSpace
  minFree.getAndAccumulate(f, (a: Long, b: Long) => math.min(a, b))
  Thread.sleep(2000)
})
mon.setDaemon(true)
mon.start()

def legScratch(label: String): Unit = {
  val end = new java.io.File("/tmp").getUsableSpace
  println(f"$label scratch: min free ${minFree.get() / 1e9}%.1f GB during leg, ${end / 1e9}%.1f GB free at leg end")
  // reap the finished leg's shuffle files before the next leg starts —
  // a DNF'd leg's spill otherwise cascades disk-full into every
  // later leg (observed in the r9e/r9f runs)
  System.gc(); Thread.sleep(3000); System.gc(); Thread.sleep(2000)
  minFree.set(Long.MaxValue)
}

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  r
}

def noop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()

val t125 = Tables(spark, "/root/repo/tmp/sf25_corpus")
val t12 = Tables(spark, "/root/repo/tmp/sf240_corpus")

// ---- leg 2: staged at 12M, p=64 — the r8 wall crossing ---------------------
{
  spark.conf.set("spark.sql.shuffle.partitions", "64")
  minFree.set(Long.MaxValue)
  time("x30 STAGED 12M p64") { noop(TextQueries.curationPipelineStaged(t12)) }
  legScratch("x30 staged 12M")
  println("X30_12M_STAGED_DONE")
}

// ---- leg 2b: staging overhead A/B at 1.25M (r8 plain: 365.5 s) -------------
{
  val plain125 = time("x30 plain 1.25M p64") { noop(TextQueries.curationPipeline(t125)); 1 }
  legScratch("x30 plain 1.25M")
  val staged125 = time("x30 STAGED 1.25M p64") { noop(TextQueries.curationPipelineStaged(t125)); 1 }
  legScratch("x30 staged 1.25M")
}

// ---- leg 3: x42 build-once, 2 batches at 12M -------------------------------
{
  spark.conf.set("spark.sql.shuffle.partitions", "256")
  val docs12 = t12.documents
  val corpus = docs12.filter(col("doc_id") % 10 =!= 0)
  val b1 = docs12.filter(col("doc_id") % 20 === 0)
  val b2 = docs12.filter(col("doc_id") % 20 === 10)
  val idx = time("x42 buildDedupIndex 10.8M") {
    val i = TextQueries.buildDedupIndex(corpus)
    i.fp.count(); i.bands.count()
    i
  }
  val s1 = time("x42 batch1 query 600k") {
    TextQueries.deltaDedupAgainst(idx, b1)
      .groupBy("status").count().collect()
  }
  println("batch1: " + s1.map(r => r.getString(0) + "=" + r.getLong(1)).sorted.mkString(" "))
  val idx2 = time("x42 absorbDelta 600k") {
    val i = TextQueries.absorbDelta(idx, b1)
    i.fp.count(); i.bands.count()
    i
  }
  val s2 = time("x42 batch2 query 600k (reused index)") {
    TextQueries.deltaDedupAgainst(idx2, b2)
      .groupBy("status").count().collect()
  }
  println("batch2: " + s2.map(r => r.getString(0) + "=" + r.getLong(1)).sorted.mkString(" "))
  idx2.release(); idx.release()
  legScratch("x42 build-once 2-batch")
}

// ---- leg 4: x50 approx after the persist fix, 12M p=256 --------------------
{
  val keptApprox = time("x50 approx 12M (persist fix)") {
    TextQueries.calibratedQualityApprox(t12).filter(col("keep")).count()
  }
  println(s"x50 approx keeps=$keptApprox")
  val keptExact = time("x50 exact 12M (reference)") {
    TextQueries.calibratedQuality(t12).filter(col("keep")).count()
  }
  println(s"x50 exact keeps=$keptExact")
  legScratch("x50 both paths 12M")
}

println("DONE_R9_SOAK_B")
sys.exit(0)
