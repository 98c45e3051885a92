package graft.streaming

import graft.SparkSpec
import graft.streaming.EventStream.Event
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  test("hourly windowed aggregation over a MemoryStream") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.hourlyAgg(mem.toDF())
      .writeStream.format("memory").queryName("hourly_agg")
      .outputMode("complete").start()
    try {
      mem.addData(
        Event(ts(9, 5), "u1", 1.5), Event(ts(9, 40), "u1", 2.5),
        Event(ts(10, 10), "u1", 4.0), Event(ts(9, 20), "u2", 7.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_agg").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2),
          r.getDecimal(3).doubleValue())).toSet
      assert(rows == Set(
        ("u1", "2026-01-01 09:00:00.0", 2L, 4.0),
        ("u1", "2026-01-01 10:00:00.0", 1L, 4.0),
        ("u2", "2026-01-01 09:00:00.0", 1L, 7.0)))
    } finally q.stop()
  }

  test("stateful running totals via mapGroupsWithState") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.runningTotals(mem.toDS())
      .writeStream.format("memory").queryName("running_totals")
      .outputMode("update").start()
    try {
      mem.addData(Event(ts(9, 0), "u1", 1.0), Event(ts(9, 1), "u1", 2.0))
      q.processAllAvailable()
      mem.addData(Event(ts(9, 2), "u1", 4.0), Event(ts(9, 3), "u2", 10.0))
      q.processAllAvailable()
      val latest = spark.table("running_totals").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      assert(latest("u1") == (("u1", 3L, 7.0))) // state carried across triggers
      assert(latest("u2") == (("u2", 1L, 10.0)))
    } finally q.stop()
  }

  test("running-totals state is TTL-evicted on event time and restarts from zero") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.runningTotals(mem.toDS(), ttlMs = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("ttl_totals")
      .outputMode("update").start()
    try {
      mem.addData(Event(ts(9, 0), "u1", 5.0))
      q.processAllAvailable()
      // before the TTL the state carries forward unchanged
      mem.addData(Event(ts(9, 10), "u1", 2.0))
      q.processAllAvailable()
      // push the watermark (1h delay) far past u1's 9:40 timeout…
      mem.addData(Event(ts(13, 0), "u2", 1.0))
      q.processAllAvailable()
      // …the timeout fires on the next trigger after the watermark update
      mem.addData(Event(ts(13, 1), "u2", 1.0))
      q.processAllAvailable()
      // u1 returns after eviction: fresh state, not a 3-event total
      mem.addData(Event(ts(13, 30), "u1", 9.0))
      q.processAllAvailable()
      val u1 = spark.table("ttl_totals").collect()
        .filter(_.getString(0) == "u1")
        .map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq
      // unchanged totals before the TTL, one final emission at eviction;
      // the flush repeats the last live numbers but carries the evicted
      // flag, so a consumer can drop it instead of double-counting
      assert(u1.count(_ == ((1L, 5.0, false))) == 1, u1)
      assert(u1.count(_ == ((2L, 7.0, false))) == 1, u1) // live update
      assert(u1.count(_ == ((2L, 7.0, true))) == 1, u1)  // eviction flush
      // restart from zero proves the state store no longer held u1
      assert(u1.last == ((1L, 9.0, false)), u1)
    } finally q.stop()
  }

  test("session windows merge events within the gap and split across it") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionAgg(mem.toDF())
      .writeStream.format("memory").queryName("session_agg")
      .outputMode("complete").start()
    try {
      mem.addData(
        Event(ts(9, 0), "u1", 1.0), Event(ts(9, 20), "u1", 2.0), // one session
        Event(ts(10, 30), "u1", 4.0), // 70-min gap: new session
        Event(ts(9, 10), "u2", 7.0))
      q.processAllAvailable()
      val rows = spark.table("session_agg").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3))).toSet
      assert(rows == Set(
        ("u1", "2026-01-01 09:00:00.0", "2026-01-01 09:50:00.0", 2L),
        ("u1", "2026-01-01 10:30:00.0", "2026-01-01 11:00:00.0", 1L),
        ("u2", "2026-01-01 09:10:00.0", "2026-01-01 09:40:00.0", 1L)), rows)
    } finally q.stop()
  }

  test("batch and streaming hourly aggregations agree on the same data") {
    val batch = Seq(
      Event(ts(9, 5), "u1", 1.5), Event(ts(9, 40), "u1", 2.5),
      Event(ts(10, 10), "u1", 4.0)).toDF()
    val agg = EventStream.hourlyAgg(batch).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
    assert(agg == Set(("u1", "2026-01-01 09:00:00.0", 2L),
      ("u1", "2026-01-01 10:00:00.0", 1L)))
  }

  test("stream-stream interval join matches errors within the horizon only") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val errors = MemoryStream[Event]
    val q = EventStream.clickErrorJoin(clicks.toDF(), errors.toDF())
      .writeStream.format("memory").queryName("click_err")
      .outputMode("append").start()
    try {
      errors.addData(
        Event(ts(9, 0), "u1", 1.0),   // within 1h of the 9:30 click
        Event(ts(7, 0), "u1", 2.0),   // outside the horizon
        Event(ts(9, 10), "u2", 3.0))  // other user
      clicks.addData(Event(ts(9, 30), "u1", 0.0))
      q.processAllAvailable()
      val rows = spark.table("click_err").collect()
        .map(r => (r.getString(0), r.getTimestamp(2).toString, r.getDouble(3)))
        .toSet
      assert(rows == Set(("u1", "2026-01-01 09:00:00.0", 1.0)))
      // a later error after the click never matches (e_ts <= c_ts)
      errors.addData(Event(ts(9, 45), "u1", 9.0))
      q.processAllAvailable()
      assert(spark.table("click_err").count() == 1)
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched clicks on watermark expiry") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val errors = MemoryStream[Event]
    val q = EventStream.clickErrorJoin(clicks.toDF(), errors.toDF(),
        joinType = "left_outer")
      .writeStream.format("memory").queryName("click_err_outer")
      .outputMode("append").start()
    try {
      clicks.addData(Event(ts(9, 30), "u1", 0.0)) // never matched
      errors.addData(Event(ts(9, 0), "u2", 1.0))  // other user only
      q.processAllAvailable()
      // the null-matched click may only emit once BOTH watermarks have
      // passed its match window AND a later trigger runs the cleanup —
      // feed watermark-advancing u3 events until it appears
      def u1Rows() = spark.table("click_err_outer").collect()
        .filter(_.getString(0) == "u1")
        .map(r => (Option(r.getTimestamp(2)), Option(r.get(3))))
      var tries = 0
      while (u1Rows().isEmpty && tries < 6) {
        clicks.addData(Event(ts(13 + tries, 0), "u3", 0.0))
        errors.addData(Event(ts(13 + tries, 0), "u3", 1.0))
        q.processAllAvailable()
        tries += 1
      }
      // exactly one outer row, with null error columns
      assert(u1Rows().toSeq == Seq((None, None)), u1Rows().toSeq)
      // inner matches still flow (u3 click ↔ u3 error at the same ts)
      assert(spark.table("click_err_outer").collect()
        .exists(r => r.getString(0) == "u3" && r.getTimestamp(2) != null))
    } finally q.stop()
  }

  test("left-outer interval join on batch frames keeps unmatched clicks") {
    val clicks = Seq(Event(ts(9, 30), "u1", 0.0), Event(ts(12, 0), "u1", 0.0)).toDF()
    val errors = Seq(Event(ts(9, 0), "u1", 1.0)).toDF()
    val out = EventStream.clickErrorJoin(clicks, errors, joinType = "left_outer")
      .collect()
      .map(r => (r.getTimestamp(1).toString,
        Option(r.getTimestamp(2)).map(_.toString))).toSet
    assert(out == Set(
      ("2026-01-01 09:30:00.0", Some("2026-01-01 09:00:00.0")),
      ("2026-01-01 12:00:00.0", None))) // outside the 1h horizon → null
  }

  test("interval join on batch frames degrades to the same range-join result") {
    val clicks = Seq(Event(ts(9, 30), "u1", 0.0), Event(ts(12, 0), "u1", 0.0)).toDF()
    val errors = Seq(Event(ts(9, 0), "u1", 1.0), Event(ts(7, 0), "u1", 2.0)).toDF()
    val out = EventStream.clickErrorJoin(clicks, errors).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getDouble(3)))
    assert(out.toSeq == Seq(("u1", "2026-01-01 09:30:00.0", 1.0)))
  }

  test("streaming KMV sketch equals the batch x20 estimate over the same prefix") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    // the real events table, fed through the stream in three chunks
    val evs = t.events
      .select(col("ts"), col("event_type"), col("user_id").cast("string"))
      .as[EventStream.KmvEvent].collect()
    val mem = MemoryStream[EventStream.KmvEvent]
    val q = EventStream.kmvSketch(mem.toDS())
      .writeStream.format("memory").queryName("kmv_sketch")
      .outputMode("update").start()
    try {
      evs.grouped(math.max(1, evs.length / 3)).foreach { chunk =>
        mem.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      // latest emission per type (update mode re-emits on every trigger)
      val streamed = spark.table("kmv_sketch").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .zipWithIndex
        .groupBy(_._1._1).view.mapValues(_.maxBy(_._2)._1._3).toMap
      val batch = graft.operators.TextQueries.kmvDistinct(t).collect()
        .map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(streamed.keySet == batch.keySet)
      batch.foreach { case (k, v) =>
        assert(streamed(k) == v, s"type $k: streamed ${streamed(k)} vs batch $v")
      }
    } finally q.stop()
  }

  test("KMV sketch state is bounded at k regardless of stream length") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[EventStream.KmvEvent]
    val q = EventStream.kmvSketch(mem.toDS(), k = 8)
      .writeStream.format("memory").queryName("kmv_bounded")
      .outputMode("update").start()
    try {
      // 500 distinct users in one type: sketch_n must clamp at 8
      (0 until 5).foreach { b =>
        mem.addData((0 until 100).map(i =>
          EventStream.KmvEvent(ts(9, 0), "view", s"user${b * 100 + i}")): _*)
        q.processAllAvailable()
      }
      val last = spark.table("kmv_bounded").collect()
        .map(r => (r.getLong(1), r.getDouble(2))).last
      assert(last._1 == 8L)
      // 500 distinct at k=8: crude estimate must land the right decade
      assert(last._2 > 100 && last._2 < 2500, last)
    } finally q.stop()
  }
}
