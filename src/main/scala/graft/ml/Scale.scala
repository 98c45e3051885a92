package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `ScaleData` semantics (`QC_helpers/dataIntegration.r:106`): per-gene
  * z-score of the log-normalized values, clipped at +10 (`scale.max`).
  *
  * Implicit zeros are handled analytically: a zero count has norm 0, so
  * its z-score is the per-gene constant `z0 = (0 − μ)/σ`. The scaled
  * matrix is therefore represented as (sparse nonzero z table, dense
  * per-gene z0 vector) — densification is deferred to the PCA row
  * builder and never materialized in a shuffle.
  */
object Scale {

  /** Per-gene (μ, σ) of the normalized value over ALL cells, with the
    * zero-inclusive correction. Genes with σ = 0 get σ = 1 (their z is
    * identically 0, matching Seurat's guard). */
  def geneMoments(norm: DataFrame, nCells: Long, valueCol: String = "norm"): DataFrame = {
    val x = col(valueCol).cast("double")
    norm.groupBy("gene")
      .agg(sum(x).as("__s"), sum(x * x).as("__ss"))
      .select(
        col("gene"),
        (col("__s") / nCells).as("mu"),
        sqrt(greatest(
          (col("__ss") - col("__s") * col("__s") / nCells) / (nCells - 1),
          lit(0.0))).as("sigma"))
      .withColumn("sigma", when(col("sigma") > 0, col("sigma")).otherwise(lit(1.0)))
  }

  /** Nonzero z-scores `(…, gene, z)` plus the per-gene implicit-zero
    * z-score column `z0` on the moments table. Clip at `clipMax`
    * (one-sided, Seurat `scale.max = 10`). */
  def scaleData(norm: DataFrame, moments: DataFrame, clipMax: Double = 10.0,
                valueCol: String = "norm"): DataFrame =
    norm
      .join(broadcast(moments), "gene")
      .withColumn("z",
        least((col(valueCol) - col("mu")) / col("sigma"), lit(clipMax)))
      .drop("mu", "sigma")

  /** z-score of an implicit zero for each gene (broadcast side of the
    * PCA densification). */
  def zeroZ(moments: DataFrame, clipMax: Double = 10.0): DataFrame =
    moments.withColumn("z0",
      least(-col("mu") / col("sigma"), lit(clipMax)))
}
