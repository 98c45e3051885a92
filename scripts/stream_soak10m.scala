// Streaming-state soak, second decade (VERDICT r7 item 6): push the
// TTL-evicted running-totals operator and the watermarked LEFT-OUTER
// stream-stream join to 10M events each, with per-checkpoint state
// metrics AND eviction accounting (evicted-flag rows counted via
// foreachBatch accumulator for totals; numRowsRemoved for the join).
// The claim: live state stays flat across a 10x-longer stream, and
// evictions keep pace with input (state in ≈ state out once warm).
// Run via spark-shell -I (see SOAK_stream.md §Setup).
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStream
import graft.streaming.EventStream.Event
import java.sql.Timestamp

implicit val ctx = spark.sqlContext
spark.conf.set("spark.sql.streaming.stateStore.providerClass",
  "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
spark.conf.set("spark.sql.streaming.stateStore.rocksdb.compactOnCommit", "true")
spark.sparkContext.setLogLevel("ERROR")
val ckptRoot = java.nio.file.Files.createTempDirectory("stream_soak10m").toString
val t0Epoch = 1700000000000L

def stateLine(tag: String, b: Int, cumRows: Long, t0: Long,
              q: org.apache.spark.sql.streaming.StreamingQuery,
              extra: String): Unit = {
  val so = q.lastProgress.stateOperators(0)
  val secs = (System.nanoTime() - t0) / 1e9
  val sst = Option(so.customMetrics.get("rocksdbSstFileSize"))
    .map(_.longValue).getOrElse(-1L)
  println(f"$tag batch=$b cum_rows=$cumRows state_rows=${so.numRowsTotal}" +
    f" removed=${so.numRowsRemoved} sst_mb=${sst / 1e6}%.1f" +
    f" rows_per_s=${cumRows / secs}%.0f $extra")
}

// ---- 1. runningTotals at 10,000,000 events --------------------------
// 200 batches x 50k events; 2,000 NEVER-repeated users per batch
// (400k cumulative users), event time +30 min per batch, TTL 1h.
// Flat-state expectation: ~4 batches of users (8,001 rows) resident,
// as in the 1.6M leg — 10x the stream, same curve. Eviction flushes
// (evicted=true output rows) are counted per batch via foreachBatch:
// once warm they must track user arrival (≈2,000/batch), the direct
// evidence that TTL eviction keeps pace at this scale.
{
  val t0 = System.nanoTime()
  val mem = MemoryStream[Event]
  val evictedAcc = spark.sparkContext.longAccumulator("evicted_flushes")
  val liveAcc = spark.sparkContext.longAccumulator("live_updates")
  val q = EventStream.runningTotals(mem.toDS(), ttlMs = 3600L * 1000)
    .writeStream.outputMode("update")
    .option("checkpointLocation", s"$ckptRoot/totals")
    .foreachBatch { (df: org.apache.spark.sql.Dataset[EventStream.UserTotal], _: Long) =>
      val both = df.groupBy("evicted").count().collect()
      both.foreach { r =>
        if (r.getBoolean(0)) evictedAcc.add(r.getLong(1))
        else liveAcc.add(r.getLong(1))
      }
    }.start()
  val nBatches = 200; val perBatch = 50000; val usersPerBatch = 2000
  (0 until nBatches).foreach { b =>
    val base = t0Epoch + b.toLong * 30 * 60 * 1000
    mem.addData((0 until perBatch).map { i =>
      Event(new Timestamp(base + (i % (30 * 60 * 1000)).toLong),
        s"u${b * usersPerBatch + i % usersPerBatch}", 1.0)
    })
    q.processAllAvailable()
    if (b % 20 == 19)
      stateLine("TOTALS10M", b, (b + 1).toLong * perBatch, t0, q,
        s"evicted_flushes=${evictedAcc.value} live_updates=${liveAcc.value}")
  }
  q.stop()
  println(s"TOTALS10M final evicted=${evictedAcc.value} " +
    s"expected~=${(200 - 4) * 2000} (users past the TTL horizon)")
}

// ---- 2. clickErrorJoin LEFT OUTER at 10,000,000 events --------------
// 200 batches x (25k clicks + 25k errors) = 10M rows through the
// symmetric-hash join. 5,000 cycling users, event time +30 min per
// batch, horizon 1h + watermark 1h: both sides' state is bounded at
// ~2.5h of input (~5 batches x 50k = 250k rows), with watermark expiry
// emitting unmatched clicks as null-error rows (counted below — the
// left-outer-specific output path). removed (numRowsRemoved) must
// track cumulative input minus the resident window.
{
  val t0 = System.nanoTime()
  val clicks = MemoryStream[Event]
  val errors = MemoryStream[Event]
  val nullAcc = spark.sparkContext.longAccumulator("outer_null_rows")
  val matchAcc = spark.sparkContext.longAccumulator("matched_rows")
  val joined = EventStream.clickErrorJoin(
    clicks.toDF(), errors.toDF(), horizon = "1 hour", joinType = "left_outer")
  val q = joined.writeStream.outputMode("append")
    .option("checkpointLocation", s"$ckptRoot/join")
    .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
      val agg = df.groupBy(df.col("e_ts").isNull.as("isNull")).count().collect()
      agg.foreach { r =>
        if (r.getBoolean(0)) nullAcc.add(r.getLong(1))
        else matchAcc.add(r.getLong(1))
      }
    }.start()
  val nBatches = 200; val perBatch = 25000; val users = 5000
  (0 until nBatches).foreach { b =>
    val base = t0Epoch + b.toLong * 30 * 60 * 1000
    // clicks from users u0..u4999; errors from users u4900..u9899 —
    // both sides at full volume (10M rows total through the join), but
    // only the 100-user overlap matches, so ~98% of clicks surface
    // through the watermark-expiry outer-null path
    def feed(off: Int, uBase: Int) = (0 until perBatch).map { i =>
      Event(new Timestamp(base + ((i + off) % (30 * 60 * 1000)).toLong),
        s"u${uBase + (b * 7 + i + off) % users}", 1.0)
    }
    clicks.addData(feed(0, 0))
    errors.addData(feed(13, 4900))
    q.processAllAvailable()
    if (b % 20 == 19)
      stateLine("JOIN10M", b, (b + 1).toLong * perBatch * 2, t0, q,
        s"outer_nulls=${nullAcc.value} matched=${matchAcc.value}")
  }
  q.stop()
  println(s"JOIN10M final outer_nulls=${nullAcc.value} matched=${matchAcc.value}")
}
println("SOAK_STREAM10M_DONE")
sys.exit(0)
