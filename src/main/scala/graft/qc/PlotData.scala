package graft.qc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Plot-data tables — the engine's replacement for the reference's PDF
  * plot sink (`4_Prepare_experiment.r:102-147`) and the `plotData`
  * halves of the step envelopes (`cellSizeDistribution.r:82-96`,
  * `mitochondrialContent.r:60-80`): emit the aggregated data a UI
  * plots, never rendered images. */
object PlotData {

  /** Histogram with fixed bin step (`hist(x, breaks)`, binStep configs
    * 200 / 0.05 at `4_Prepare_experiment.r:225,231,248`): per-sample
    * `(sample, bin, lo, n)`. The gate query Q13 is this operator's
    * star-schema form. */
  def histogram(cells: DataFrame, valueCol: String, binStep: Double): DataFrame =
    cells
      .groupBy(col("sample"),
        floor(col(valueCol) / binStep).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lo", col("bin") * binStep)
      .select("sample", "bin", "lo", "n")

  /** Barcode-rank curve (`cellSizeDistribution.r:61-62`): per-sample
    * `(sample, rk, nCount, log10_rank, log10_nCount)` ordered by rank
    * descending in count. */
  def rankCurve(cells: DataFrame): DataFrame =
    cells
      .select(col("sample"), col("nCount"),
        row_number().over(
          Window.partitionBy("sample")
            .orderBy(col("nCount").desc, col("barcode"))).cast("long").as("rk"))
      .withColumn("log10_rank", log10(col("rk")))
      .withColumn("log10_nCount", log10(col("nCount")))

  /** Genes-vs-UMIs scatter pairs (`numGenesVsNumUmis.r:97-107`):
    * `(sample, barcode, log10_UMIs, log10_genes)`. */
  def genesVsUmis(cells: DataFrame): DataFrame =
    cells.select(col("sample"), col("barcode"),
      log10(col("nCount")).as("log10_UMIs"),
      log10(col("nFeature")).as("log10_genes"))
}
