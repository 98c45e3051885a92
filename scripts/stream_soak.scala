// Streaming-state soak: drives the three stateful streaming operators
// over ~1M+ synthetic events with the RocksDB state store and records
// throughput + state-store size per progress checkpoint. The claim
// under test: every operator's state is BOUNDED — the curve must go
// flat while cumulative input grows linearly.
// Run via spark-shell -I (see SOAK_stream.md).
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{DocStream, EventStream}
import graft.streaming.DocStream.Doc
import graft.streaming.EventStream.Event
import java.sql.Timestamp

implicit val ctx = spark.sqlContext
spark.conf.set("spark.sql.streaming.stateStore.providerClass",
  "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
// without per-commit compaction, RocksDB's memoryUsedBytes tracks SST
// files retained for OLD checkpoint versions (minBatchesToRetain=100),
// which grows with batch count even when the LOGICAL state (numRowsTotal)
// is flat — compact so the size curve measures live state, not history
spark.conf.set("spark.sql.streaming.stateStore.rocksdb.compactOnCommit", "true")
spark.sparkContext.setLogLevel("ERROR")
val ckptRoot = java.nio.file.Files.createTempDirectory("stream_soak").toString
val t0Epoch = 1700000000000L // fixed epoch base, deterministic feed

def report(tag: String, b: Int, cumRows: Long, t0: Long,
           q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
  val p = q.lastProgress
  val so = p.stateOperators(0)
  val secs = (System.nanoTime() - t0) / 1e9
  // live on-disk state (all SST files, post compactOnCommit) — the
  // direct measure of state size; memoryUsedBytes additionally counts
  // the LRU block cache, which FILLS toward its configured capacity
  // (8 MB x shuffle partitions) and so rises with batch count even
  // when state is flat
  val sst = Option(so.customMetrics.get("rocksdbSstFileSize"))
    .map(_.longValue).getOrElse(-1L)
  println(f"$tag batch=$b cum_rows=$cumRows state_rows=${so.numRowsTotal}" +
    f" sst_mb=${sst / 1e6}%.1f state_mb=${so.memoryUsedBytes / 1e6}%.1f" +
    f" elapsed=${secs}%.1f s rows_per_s=${cumRows / secs}%.0f")
}

// ---- 1. runningTotals: TTL-evicted per-user state -------------------
// 2,000 NEVER-REPEATED users per batch, event time advancing 30 min per
// batch, TTL 1h: without eviction state grows to 100k users; with it,
// only users inside the ~2h watermark+TTL horizon stay resident.
{
  val t0 = System.nanoTime()
  val mem = MemoryStream[Event]
  val q = EventStream.runningTotals(mem.toDS(), ttlMs = 3600L * 1000)
    .writeStream.format("noop").outputMode("update")
    .option("checkpointLocation", s"$ckptRoot/totals").start()
  // 80 batches (~2.5 min): long enough that the 60 s state-store
  // maintenance cycle trims old RocksDB versions at least twice, so the
  // memoryUsedBytes curve shows its plateau, not just compaction lag
  val nBatches = 80; val perBatch = 20000; val usersPerBatch = 2000
  (0 until nBatches).foreach { b =>
    val base = t0Epoch + b.toLong * 30 * 60 * 1000
    mem.addData((0 until perBatch).map { i =>
      Event(new Timestamp(base + (i % (30 * 60 * 1000)).toLong),
        s"u${b * usersPerBatch + i % usersPerBatch}", 1.0)
    })
    q.processAllAvailable()
    if (b % 10 == 9) report("TOTALS", b, (b + 1).toLong * perBatch, t0, q)
  }
  q.stop()
}

// ---- 2. exactDedup: fingerprint state inside the watermark ----------
// 20% duplicate docs; state holds only fingerprints within the 1h
// horizon (2 batches), so cumulative fingerprints grow 25x past it.
{
  val t0 = System.nanoTime()
  val mem = MemoryStream[Doc]
  val q = DocStream.exactDedup(mem.toDF(), horizon = "1 hour")
    .writeStream.format("noop").outputMode("append")
    .option("checkpointLocation", s"$ckptRoot/dedup").start()
  val nBatches = 50; val perBatch = 20000
  (0 until nBatches).foreach { b =>
    val base = t0Epoch + b.toLong * 30 * 60 * 1000
    mem.addData((0 until perBatch).map { i =>
      val uniq = b.toLong * perBatch + i
      // every 5th doc repeats the previous doc's text (an exact dup)
      val key = if (i % 5 == 4) uniq - 1 else uniq
      Doc(new Timestamp(base + (i % (30 * 60 * 1000)).toLong), uniq,
        s"document body number $key with shared filler words")
    })
    q.processAllAvailable()
    if (b % 10 == 9) report("DEDUP", b, (b + 1).toLong * perBatch, t0, q)
  }
  q.stop()
}

// ---- 3. nearDupFlags: bounded FIFO per SimHash bucket ---------------
// perBucket=64 caps every bucket cohort; state is O(buckets x 64)
// regardless of stream length.
{
  val t0 = System.nanoTime()
  val mem = MemoryStream[Doc]
  val q = DocStream.nearDupFlags(mem.toDS(), perBucket = 64)
    .writeStream.format("noop").outputMode("append")
    .option("checkpointLocation", s"$ckptRoot/neardup").start()
  // 120 batches: past the point where memoryUsedBytes hits the block
  // cache capacity ceiling (~8 MB x 32 stores), so the artifact shows
  // BOTH curves flat — sst_mb from the start, state_mb at its cap
  val nBatches = 120; val perBatch = 10000
  (0 until nBatches).foreach { b =>
    mem.addData((0 until perBatch).map { i =>
      val uniq = b.toLong * perBatch + i
      Doc(new Timestamp(t0Epoch + uniq), uniq,
        s"tok${uniq % 97} alpha beta tok${uniq % 13} gamma delta tok${uniq % 7} epsilon")
    })
    q.processAllAvailable()
    if (b % 6 == 5) report("NEARDUP", b, (b + 1).toLong * perBatch, t0, q)
  }
  q.stop()
}
println("SOAK_STREAM_DONE")
sys.exit(0)
