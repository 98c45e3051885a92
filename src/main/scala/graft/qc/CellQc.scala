package graft.qc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-cell QC metric assembly and matrix trimming — the relational
  * re-expression of `CreateSeuratObject` + `PercentageFeatureSet`
  * (`3_Seurat.r:55-77`).
  *
  * Everything is keyed `(sample, barcode)` or `(sample, gene)` — the
  * partition-friendly keys of SURVEY §4 — and reduces in one hash
  * aggregation with map-side partials. No driver collection anywhere.
  */
object CellQc {

  /** Mito-gene set: annotation names matching `^mt-` case-insensitively
    * (`3_Seurat.r:69-72`). Returns `(gene)` keyed by annotation id. */
  def mitoGenes(genes: DataFrame): DataFrame =
    genes
      .filter(lower(col("name")).rlike("^mt-"))
      .select(col("input").as("gene"))

  /** Per-cell metrics from the long counts table:
    *  - `nCount`  = colSums          (`3_Seurat.r:59`, `2-1:42-48`)
    *  - `nFeature`= colSums(x > 0)   (`2-2:34`)
    *  - `percent_mt` = 100 · Σ mito / Σ all (`PercentageFeatureSet`,
    *    `3_Seurat.r:74`); `fraction_mt` is stored alongside because the
    *    reference filters on the 0-1 fraction (`mitochondrialContent.r:54`)
    *    but computes the 0-100 percent — the unit quirk documented in
    *    SURVEY §2.9.
    */
  def cellMetrics(expr: DataFrame, genes: DataFrame): DataFrame = {
    val mt = mitoGenes(genes).withColumn("is_mt", lit(true))
    expr
      .join(broadcast(mt), Seq("gene"), "left")
      .groupBy("sample", "barcode")
      .agg(
        sum("count").as("nCount"),
        count(when(col("count") > 0, 1)).as("nFeature"),
        coalesce(sum(when(col("is_mt"), col("count"))), lit(0L)).as("mt_count"))
      .withColumn("fraction_mt",
        col("mt_count").cast("double") / col("nCount").cast("double"))
      .withColumn("percent_mt", col("fraction_mt") * 100)
      .drop("mt_count")
  }

  /** `CreateSeuratObject(min.cells, min.features)` trimming
    * (`3_Seurat.r:59`), per sample, in Seurat's order: genes detected
    * in ≥ minCells cells first, then cells with ≥ minFeatures genes
    * counted over the *trimmed* gene set. Two grouped counts + two
    * left-semi joins — both shuffles are on the natural keys. */
  def degreeFilter(expr: DataFrame, minCells: Int = 3, minFeatures: Int = 10): DataFrame = {
    val nz = expr.filter(col("count") > 0)
    val keptGenes = nz
      .groupBy("sample", "gene").agg(count(lit(1)).as("n_cells"))
      .filter(col("n_cells") >= minCells)
      .select("sample", "gene")
    val afterGenes = expr.join(keptGenes, Seq("sample", "gene"), "left_semi")
    val keptCells = afterGenes.filter(col("count") > 0)
      .groupBy("sample", "barcode").agg(count(lit(1)).as("n_genes"))
      .filter(col("n_genes") >= minFeatures)
      .select("sample", "barcode")
    afterGenes.join(keptCells, Seq("sample", "barcode"), "left_semi")
  }

  /** Pre-doublet-scoring cell filter: keep cells with
    * `colSums(x > 0) >= minFeatures` (`2-2:31,34`). */
  def minFeatureFilter(expr: DataFrame, minFeatures: Int = 10): DataFrame = {
    val kept = expr.filter(col("count") > 0)
      .groupBy("sample", "barcode").agg(count(lit(1)).as("n_genes"))
      .filter(col("n_genes") >= minFeatures)
      .select("sample", "barcode")
    expr.join(kept, Seq("sample", "barcode"), "left_semi")
  }
}
