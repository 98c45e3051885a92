// Corpus-decade re-soak, round 10: prove the native-expression rework
// (graft_tokens + graft_hashed_shingles + the size(toks)>=3 pre-filter)
// that recovered the x06/x07/x52/x57 bench regression did NOT give back
// the round-9 12M-doc scratch win. Claims:
//  - x30 at 12M (plain AND staged) completes at <= the r9 scratch
//    profile (r9: plain 781 s at ~36 GB; staged ~25 GB peak);
//  - x07 wide-banding (8x2) at 12M completes with the same pair count
//    as r9 (the banding semantics are untouched) at <= r9 wall.
// Run:
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=256 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/corpus_soak_r10.scala
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.TextQueries
spark.sparkContext.setLogLevel("WARN")
spark.conf.set("spark.sql.shuffle.partitions", "256") // the x07 12M knob

val minFree = new java.util.concurrent.atomic.AtomicLong(Long.MaxValue)
val mon = new Thread(() => while (true) {
  val f = new java.io.File("/tmp").getUsableSpace
  minFree.getAndAccumulate(f, (a: Long, b: Long) => math.min(a, b))
  Thread.sleep(1000)
})
mon.setDaemon(true); mon.start()
def legScratch(label: String): Unit = {
  val end = new java.io.File("/tmp").getUsableSpace
  println(f"$label scratch: min free ${minFree.get() / 1e9}%.1f GB during leg, ${end / 1e9}%.1f GB free at leg end")
  System.gc(); Thread.sleep(3000); System.gc(); Thread.sleep(2000)
  minFree.set(Long.MaxValue)
}
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  r
}
def noop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()

val t12 = Tables(spark, "/root/repo/tmp/sf240_corpus")
println("docs=" + t12.documents.count())

{
  val n = time("x07 wide 8x2 12M p256") {
    TextQueries.lshPairs(t12, bandRows = 8, numBands = 2).count()
  }
  println(s"x07 12M pairs=$n")
  legScratch("x07 12M")
}
{
  time("x30 PLAIN 12M p256") { noop(TextQueries.curationPipeline(t12)) }
  legScratch("x30 plain 12M")
}
{
  time("x30 STAGED 12M p256") { noop(TextQueries.curationPipelineStaged(t12)) }
  legScratch("x30 staged 12M")
}
println("R10_CORPUS_SOAK_DONE")
sys.exit(0)
