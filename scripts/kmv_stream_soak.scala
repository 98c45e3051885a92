// Streaming KMV sketch soak: 10,000,000 events through kmvSketch
// (round-8d). Claims: state is k longs per event type REGARDLESS of
// stream length (numRowsTotal == #types across the whole run), and the
// k=256 estimate lands within KMV error (~1/sqrt(k) = 6.3% relative)
// of the true 2M distinct users per type. Run via spark-shell -I
// (same session shape as stream_soak10m.scala; the braced block keeps
// the REPL from splitting the builder chains).
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStream
import graft.streaming.EventStream.KmvEvent
import java.sql.Timestamp

implicit val ctx = spark.sqlContext
spark.conf.set("spark.sql.streaming.stateStore.providerClass",
  "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
spark.sparkContext.setLogLevel("ERROR")

{
  val ckpt = java.nio.file.Files.createTempDirectory("kmv_soak").toString
  val t0 = System.nanoTime()
  val mem = MemoryStream[KmvEvent]
  val q = EventStream.kmvSketch(mem.toDS(), k = 256)
    .writeStream.outputMode("update")
    .option("checkpointLocation", ckpt)
    .format("memory").queryName("kmv10m").start()
  val nBatches = 200; val perBatch = 50000; val types = 5
  (0 until nBatches).foreach { b =>
    mem.addData((0 until perBatch).map { i =>
      val g = b.toLong * perBatch + i
      KmvEvent(new Timestamp(1700000000000L + g), "t" + (g % types), "u" + g)
    }: _*)
    q.processAllAvailable()
    if ((b + 1) % 40 == 0) {
      val so = q.lastProgress.stateOperators(0)
      val cum = (b + 1).toLong * perBatch
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"kmv batch=${b + 1} cum_rows=$cum state_rows=${so.numRowsTotal}" +
        f" rows_per_s=${cum / secs}%.0f")
    }
  }
  val last = spark.table("kmv10m").collect()
    .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    .zipWithIndex.groupBy(_._1._1).view.mapValues(_.maxBy(_._2)._1).toMap
  val truth = nBatches.toLong * perBatch / types
  last.toSeq.sortBy(_._1).foreach { case (tp, (_, n, est)) =>
    val rel = math.abs(est - truth) / truth
    println(f"kmv final type=$tp sketch_n=$n est=$est%.0f truth=$truth rel_err=$rel%.4f")
  }
  q.stop()
  println("DONE_KMV_SOAK")
}
sys.exit(0)
