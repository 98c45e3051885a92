package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count normalization on the long/COO table. */
object Normalize {

  /** `LogNormalize` (`QC_helpers/dataIntegration.r:92,101` semantics):
    * `norm = log1p(count / cellTotal · scaleFactor)`. One grouped sum +
    * one equi join, both keyed `(sample, barcode)` — at scale the join
    * co-partitions with the aggregation's shuffle output, so the
    * normalized table costs one shuffle total. Implicit zeros stay
    * implicit (log1p(0) = 0). */
  def logNormalize(expr: DataFrame, scaleFactor: Double = 1e4): DataFrame = {
    val totals = expr
      .groupBy("sample", "barcode")
      .agg(sum("count").as("__total"))
    expr
      .join(totals, Seq("sample", "barcode"))
      .withColumn("norm",
        log1p(col("count").cast("double") / col("__total") * scaleFactor))
      .drop("__total")
  }
}
