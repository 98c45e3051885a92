// Streaming chunk-dedup soak (round 8): DocStream.chunkDedup under
// sustained load — 400k docs / 2M chunks through the RocksDB state
// store. Claim under test: state tracks DISTINCT chunks inside the
// watermark horizon only (fresh chunks enter, expired ones evict), so
// the state curve goes FLAT while cumulative chunks grow linearly,
// and the planted boilerplate span is emitted exactly once.
// Run (box idle):
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 16g \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/chunk_stream_soak.scala
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.DocStream
import graft.streaming.DocStream.Doc
import java.sql.Timestamp

implicit val ctx = spark.sqlContext
spark.conf.set("spark.sql.streaming.stateStore.providerClass",
  "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
spark.conf.set("spark.sql.streaming.stateStore.rocksdb.compactOnCommit", "true")
spark.sparkContext.setLogLevel("ERROR")
val ckpt = java.nio.file.Files.createTempDirectory("chunk_soak").toString
val t0Epoch = 1700000000000L

val boiler = (1 to 20).map(i => s"boilerplate$i").mkString(" ")
def freshDoc(b: Int, i: Int): String = {
  // 4 fresh 20-token chunks + the shared boilerplate span
  val body = (0 until 80).map(k => s"b${b}d${i}t$k").mkString(" ")
  s"$boiler $body"
}

val t0 = System.nanoTime()
val mem = MemoryStream[Doc]
val q = {
  DocStream.chunkDedup(mem.toDF(), horizon = "1 hour")
    .writeStream.format("noop").outputMode("append")
    .option("checkpointLocation", ckpt).start()
}
val nBatches = 40; val perBatch = 10000
var cumChunks = 0L
(0 until nBatches).foreach { b =>
  val base = t0Epoch + b.toLong * 30 * 60 * 1000
  mem.addData((0 until perBatch).map { i =>
    Doc(new Timestamp(base + (i % (30 * 60 * 1000)).toLong),
      b.toLong * perBatch + i, freshDoc(b, i))
  })
  q.processAllAvailable()
  cumChunks += perBatch * 5L
  if ((b + 1) % 5 == 0) {
    val p = q.lastProgress
    val so = p.stateOperators(0)
    val sst = Option(so.customMetrics.get("rocksdbSstFileSize"))
      .map(_.longValue).getOrElse(-1L)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"chunk batch=${b + 1} cum_chunks=$cumChunks" +
      f" state_rows=${so.numRowsTotal} sst_mb=${sst / 1e6}%.1f" +
      f" elapsed=$secs%.1f s chunks_per_s=${cumChunks / secs}%.0f")
  }
}
q.stop()
println("DONE")
sys.exit(0)
