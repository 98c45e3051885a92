package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-sample merge semantics (`4_Prepare_experiment.r:46-80`).
  *
  * In long/COO form the Seurat `merge` is almost free: the gene axis is
  * the union of gene sets and absent (gene, cell) pairs simply have no
  * row (SURVEY §2.7) — so the merge is a plain `union`, already done by
  * keeping every sample in one partitioned table. What remains is
  * naming and identity:
  */
object MergeSamples {

  /** `RenameCells(add.cell.ids = sample)` (`4_Prepare_experiment.r:48`):
    * globally-unique cell name = `sample_barcode`. */
  def withCellName(df: DataFrame, out: String = "cell"): DataFrame =
    df.withColumn(out, concat_ws("_", col("sample"), col("barcode")))

  /** Union + dedup of per-sample annotation tables (`1_Preproc.r:143`). */
  def unionAnnotations(tables: Seq[DataFrame]): DataFrame =
    tables.reduce(_ unionByName _).dropDuplicates()

  /** Duplicate gene-symbol rename (`4_Prepare_experiment.r:66-74`):
    * names shared by >1 annotation become `"name - input"`; the
    * original symbol is preserved in `original_name`. Uniqueness after
    * rename is the reference's own invariant (`test_object.r:47`). */
  def dedupGeneNames(genes: DataFrame): DataFrame = {
    val perName = Window.partitionBy("name")
    genes
      .withColumn("original_name", col("name"))
      .withColumn("name",
        when(count(lit(1)).over(perName) > 1,
          concat(col("name"), lit(" - "), col("input")))
          .otherwise(col("name")))
  }

  /** Dense `cells_id` over the merged cell table, ordered by
    * `(sample, barcode)` (`4_Prepare_experiment.r:80`; the reference's
    * order is sample merge order then within-sample column order — both
    * normalized here to explicit lexicographic sort keys, SURVEY §2.10
    * determinism convention). */
  def withCellsId(cells: DataFrame): DataFrame =
    DenseId.withDenseId(cells, Seq(col("sample"), col("barcode")), "cells_id")
}
