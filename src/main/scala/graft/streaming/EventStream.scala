package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types.DecimalType

/** Structured-Streaming surface over the `events` feed (SURVEY §2.9b:
  * beyond-reference, non-gating — the reference is a one-shot batch
  * DAG; these are the streaming forms of the gated batch analogs Q31
  * and Q32, same aggregation logic applied to an unbounded source).
  */
object EventStream {

  final case class Event(ts: java.sql.Timestamp, user_id: String, value: Double)

  /** `evicted = true` marks the final TTL flush of a user's standing
    * total (same numbers as the last live update — consumers that must
    * not double-count filter on the flag or stay idempotent on
    * (user_id, n)); `false` is a live per-trigger update. */
  final case class UserTotal(user_id: String, n: Long, total: Double,
                             evicted: Boolean)

  /** Q31's streaming form: tumbling 1-hour windows per user with a
    * 1-hour watermark (late events beyond it are dropped; state is
    * bounded). Works on both batch and streaming DataFrames. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DecimalType(18, 6)).as("tot"))
      .select(col("user_id"), col("window.start").as("h"), col("n"), col("tot"))

  /** Q33's streaming form: session windows with a 30-minute gap per
    * user; the watermark bounds session state (a session closes — and
    * emits — once the watermark passes its end). Works on both batch
    * and streaming frames like [[hourlyAgg]]. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DecimalType(18, 6)).as("tot"))
      .select(col("user_id"),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("n"), col("tot"))

  /** Q36's streaming form: a watermarked stream-stream INTERVAL join —
    * each click joined to errors of the same user within the preceding
    * `horizon`. Both sides carry watermarks and the join predicate
    * time-bounds the match, so the state store retains only `horizon +
    * watermark` of either stream (unbounded state would be the
    * streaming scale-killer).
    *
    * `joinType` "inner" (default): clicks with no error in the horizon
    * don't emit. "left_outer": they DO emit — with null error columns —
    * once the error-side watermark passes the point where a match has
    * become impossible (Spark's watermark-expiry outer emission), the
    * streaming answer to "clicks with no error" that q36's batch as-of
    * covers with its left join. Works on batch frames too, where
    * either form degrades to a plain (outer) range join. */
  def clickErrorJoin(clicks: DataFrame, errors: DataFrame,
                     horizon: String = "1 hour",
                     joinType: String = "inner"): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
      .withWatermark("c_ts", "1 hour")
    val e = errors
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("value").as("e_value"))
      .withWatermark("e_ts", "1 hour")
    c.join(e,
      col("c_user") === col("e_user") &&
        col("e_ts") <= col("c_ts") &&
        col("e_ts") >= col("c_ts") - expr(s"INTERVAL $horizon"),
      joinType)
      .select(col("c_user").as("user_id"), col("c_ts"), col("e_ts"),
        col("e_value"))
  }

  /** Q32's stateful form: running per-user totals via
    * `mapGroupsWithState` — the engine's `KeyValueGroupedDataset`
    * custom-state surface. Emits the updated running total for each
    * user on every trigger.
    *
    * State is TTL-bounded (the repo-wide streaming posture: every
    * stateful op bounds its state — unbounded per-user state at 100 TB
    * event scale with open-ended user cardinality grows the state
    * store forever). A user idle past `ttl` of EVENT time — measured
    * against the watermark, so it's deterministic and replay-safe, not
    * wall-clock — has its state evicted after one final emission of
    * the standing total; a later event restarts that user from zero.
    * The eviction flush REPEATS the numbers of the last live update
    * (the flush marks "this total is now final"), flagged
    * `evicted = true` so an update-stream consumer can distinguish or
    * drop it instead of double-counting. */
  final case class KmvEvent(ts: java.sql.Timestamp, event_type: String,
                            user_id: String)
  final case class KmvEstimate(event_type: String, sketch_n: Long,
                               kmv_est: Double)

  /** The x20 KMV distinct-count sketch as a STREAMING accumulator: per
    * event type the state is the k minimum 60-bit user-id hashes — k
    * longs FOREVER, regardless of stream length, the textbook bounded-
    * state cardinality counter — and each trigger emits the updated
    * estimate. KMV is mergeable and insert-only, so the streaming fold
    * equals batch `TextQueries.kmvDistinct` over the same prefix
    * EXACTLY (same h60 hash, same (k−1)/u_k estimator, same rounding —
    * pinned in StreamingSpec): a dashboard reading the update stream
    * matches any offline recomputation bit-for-bit, up to one caveat —
    * this TreeSet dedups HASH values while the batch kmvDistinct ranks
    * rows of distinct user_ids, so if two distinct users ever collide
    * in the 60-bit hash (P ≈ n²/2⁶¹ — astronomically unlikely at any
    * real key count) sketch_n and the k-th-smallest value can differ
    * by the collided entry (r8 ADVICE). Deliberately no timeout: the
    * sketch IS the product, not a session — state is k longs per group
    * by construction and eviction would only destroy it. */
  def kmvSketch(events: Dataset[KmvEvent], k: Int = 32): Dataset[KmvEstimate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (etype: String, batch: Iterator[KmvEvent],
         state: GroupState[Array[Long]]) =>
          val set = scala.collection.mutable.TreeSet.empty[Long]
          state.getOption.foreach(set ++= _)
          batch.foreach { e =>
            val h = graft.functions.Hash60.h60(
              org.apache.spark.unsafe.types.UTF8String.fromString(e.user_id))
            if (set.size < k) set += h
            else if (h < set.last && !set.contains(h)) {
              set += h; set -= set.last
            }
          }
          val arr = set.toArray
          state.update(arr)
          val est =
            if (arr.length < k) arr.length.toDouble
            else (k - 1).toDouble /
              (arr.last.toDouble / 1152921504606846976.0 /* 2^60 */)
          KmvEstimate(etype, arr.length.toLong,
            BigDecimal(est).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble)
      }
  }

  def runningTotals(events: Dataset[Event],
                    ttlMs: Long = 3600L * 1000): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout()) {
        (user: String, batch: Iterator[Event], state: GroupState[(Long, Double)]) =>
          if (state.hasTimedOut) {
            val (n, t) = state.get
            state.remove()
            UserTotal(user, n, t, evicted = true)
          } else {
            val (n0, t0) = state.getOption.getOrElse((0L, 0.0))
            var n = n0; var t = t0; var maxTs = Long.MinValue
            batch.foreach { e =>
              n += 1; t += e.value
              if (e.ts.getTime > maxTs) maxTs = e.ts.getTime
            }
            state.update((n, t))
            // timeout must sit above the current watermark; batch
            // execution has no watermark (timeouts never fire there)
            val wm =
              try state.getCurrentWatermarkMs()
              catch { case _: UnsupportedOperationException => Long.MinValue }
            state.setTimeoutTimestamp(math.max(maxTs, wm) + ttlMs)
            UserTotal(user, n, t, evicted = false)
          }
      }
  }
}
