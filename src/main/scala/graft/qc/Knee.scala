package graft.qc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Barcode-rank knee detection — the auto-threshold of the
  * cellSizeDistribution step (`QC_helpers/cellSizeDistribution_config.r:15-37`,
  * Seurat `CalculateBarcodeInflections` semantics: extreme of the
  * derivative of log10(count) vs log10(rank), above
  * `threshold.low = 100`).
  *
  * Fully relational (SURVEY §2.5 Q22/Q23 pattern): per-sample window
  * rank + lag derivative + argmin — one shuffle keyed by sample, no
  * driver kernel, so the same plan computes every sample's threshold in
  * one pass (the reference loops samples serially,
  * `4_Prepare_experiment.r:315-325`).
  */
object Knee {

  /** Per-sample `minCellSize` threshold from per-cell totals
    * `(sample, barcode, nCount)`. Returns `(sample, minCellSize)`. */
  def thresholds(cellCounts: DataFrame, thresholdLow: Long = 100): DataFrame = {
    val byRank = Window.partitionBy("sample")
      .orderBy(col("nCount").desc, col("barcode"))
    val ranked = cellCounts
      .filter(col("nCount") > thresholdLow)
      .select(col("sample"), col("nCount"),
        row_number().over(byRank).as("rk"))
    val seq = Window.partitionBy("sample").orderBy("rk")
    val deriv = ranked
      .withColumn("d_logc",
        log10(col("nCount")) - lag(log10(col("nCount")), 1).over(seq))
      .withColumn("d_logr",
        log10(col("rk")) - lag(log10(col("rk")), 1).over(seq))
      .filter(col("d_logr") > 0)
      .withColumn("deriv", col("d_logc") / col("d_logr"))
    val steepest = Window.partitionBy("sample")
      .orderBy(col("deriv").asc, col("rk").asc)
    deriv
      .withColumn("rn", row_number().over(steepest))
      .filter(col("rn") === 1)
      .select(col("sample"), col("nCount").cast("long").as("minCellSize"))
  }
}
