// Per-branch scratch attribution for x30 at 1.25M and 5M: noop-write
// each branch separately, record wall + low-water disk mark, so the
// staged-pipeline design targets the branch that actually spills.
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.TextQueries
spark.sparkContext.setLogLevel("WARN")
spark.conf.set("spark.sql.shuffle.partitions", "64")

val minFree = new java.util.concurrent.atomic.AtomicLong(Long.MaxValue)
val mon = new Thread(() => while (true) {
  val f = new java.io.File("/tmp").getUsableSpace
  minFree.getAndAccumulate(f, (a: Long, b: Long) => math.min(a, b))
  Thread.sleep(1000)
})
mon.setDaemon(true); mon.start()

def noop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()

def leg[T](label: String)(f: => T): Unit = {
  minFree.set(Long.MaxValue)
  val t0 = System.nanoTime()
  f
  val secs = (System.nanoTime() - t0) / 1e9
  val free0 = new java.io.File("/tmp").getUsableSpace
  println(f"$label%-28s $secs%8.1f s  scratch>=${(free0 - minFree.get).max(0L) / 1e9}%6.1f GB (free now ${free0 / 1e9}%5.1f GB)")
}

for ((dir, tag) <- Seq("/root/repo/tmp/sf25_corpus" -> "1.25M",
                       "/root/repo/tmp/sf100_corpus" -> "5M")) {
  val t = Tables(spark, dir)
  val frames = TextQueries.curationBranchFrames(t)
  val td = frames.find(_._1 == "td").get._2
  frames.foreach { case (name, df) =>
    leg(s"$tag $name")(noop(df))
  }
  td.unpersist(true)
  spark.sharedState.cacheManager.clearCache()
}
println("DONE_BRANCH_PROBE")
sys.exit(0)
