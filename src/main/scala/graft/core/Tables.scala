package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Handles to the star-schema tables of one scale-factor directory
  * (see TESTDATA.md / FIXTURES.md §B).
  *
  * Design notes (100 TB posture):
  *  - Plain `spark.read.parquet` so Catalyst keeps predicate pushdown,
  *    column pruning and partition pruning on every downstream query.
  *  - Nothing is cached here: each query plans its own scan so the
  *    optimizer sees the full pipeline (filter → scan fusion).
  *  - `events.ts` is written as parquet TIMESTAMP(NANOS) which Spark's
  *    vectorized reader rejects; we read it via the documented
  *    `spark.sql.legacy.parquet.nanosAsLong` escape hatch and convert
  *    ns → a proper TimestampType column (µs precision, UTC session).
  */
final case class Tables(spark: SparkSession, dir: String) {

  private def table(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame   = table("region")
  def nation: DataFrame   = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame     = table("part")
  def orders: DataFrame   = table("orders")
  def lineitem: DataFrame = table("lineitem")
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** `events` with `ts` as TimestampType (truncated ns → µs) and
    * `ts_ns` preserving the exact nanosecond long for total ordering. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table("events")
      .withColumn("ts_ns", col("ts"))
      // integer division: `/` would promote to double and lose
      // precision above 2^53 (epoch-ns ~1.7e18), shifting events that
      // sit within ~130ns of an hour boundary into the wrong bucket
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
