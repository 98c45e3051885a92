package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Deterministic, dense, contiguous 0-based row ids — the engine's
  * `cells_id` primitive (`4_Prepare_experiment.r:80`; contiguity
  * asserted by the reference's own suite at `test_object.r:26-29`).
  *
  * `row_number()` over an unpartitioned window (the Q21 gate shape) is
  * correct but funnels every row through ONE task — fine for ≤ 10⁶
  * post-QC cells, wrong at 100 TB. This operator gets the same ids
  * with two distributed passes instead:
  *
  *  1. range-partition + sort by the key (the shuffle Spark would do
  *     for a global sort anyway), count rows per partition;
  *  2. broadcast the cumulative offsets and assign ids with a
  *     per-partition running counter.
  *
  * Never `monotonically_increasing_id` (non-contiguous by design).
  * The sort key must be unique for the ids to be deterministic; the
  * input is analyzed twice, so persist upstream if it is expensive.
  */
object DenseId {

  def withDenseId(df: DataFrame, sortCols: Seq[Column], out: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val counts = sorted.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(counts.scanLeft(0L)(_ + _))
    val schema = df.schema.add(out, LongType, nullable = false)
    val rows = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var next = offsets.value(i)
      it.map { r => val withId = Row.fromSeq(r.toSeq :+ next); next += 1; withId }
    }
    spark.createDataFrame(rows, schema)
  }
}
