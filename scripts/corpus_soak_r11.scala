// Corpus-decade soak, round 11: prove the DISK_ONLY staged-checkpoint
// fix removed the staged curation form's 48 g-driver MEMORY floor
// (r10 finding: at 24 g the staged leg died AGGREGATE_OUT_OF_MEMORY in
// the decontamination stage while completed stages' MEMORY_AND_DISK
// localCheckpoint blocks squatted in the unified storage region; the
// plain form completed at 24 g). Claim: staged 12M now completes at a
// 24 g driver with scratch still ~28 GB, statuses unchanged.
// Run:
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=256 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/corpus_soak_r11.scala
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.TextQueries
spark.sparkContext.setLogLevel("WARN")
spark.conf.set("spark.sql.shuffle.partitions", "256") // the 12M knob

val minFree = new java.util.concurrent.atomic.AtomicLong(Long.MaxValue)
val mon = new Thread(() => while (true) {
  val f = new java.io.File("/tmp").getUsableSpace
  minFree.getAndAccumulate(f, (a: Long, b: Long) => math.min(a, b))
  Thread.sleep(1000)
})
mon.setDaemon(true); mon.start()
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  r
}

val t12 = Tables(spark, "/root/repo/tmp/sf240_corpus")
println("docs=" + t12.documents.count())

// write the output so the status distribution is checkable without a
// second pipeline execution
time("x30 STAGED 12M p256 24g") {
  TextQueries.curationPipelineStaged(t12).write.mode("overwrite").parquet("/root/repo/tmp/x30_staged_r11")
}
val end = new java.io.File("/tmp").getUsableSpace
println(f"staged scratch: min free ${minFree.get() / 1e9}%.1f GB during leg, ${end / 1e9}%.1f GB free at end")
spark.read.parquet("/root/repo/tmp/x30_staged_r11").groupBy("status").count().orderBy("status").collect().foreach(r => println(s"status ${r.getString(0)} = ${r.getLong(1)}"))
sys.exit(0)
