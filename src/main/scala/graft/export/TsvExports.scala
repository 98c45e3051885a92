package graft.export

import graft.core.Experiment
import graft.sources.Tsv
import org.apache.spark.sql.functions._

/** The stage-4/5 TSV/CSV export suite (`4_Prepare_experiment.r:168-201`,
  * `3_Seurat.r:135-136`) — the five tabular files the reference's upload
  * path reads back (`5_Upload-to-aws.py:50-55`). All tab-separated
  * despite the `.csv` names (reference quirk, kept verbatim); each is a
  * small single-file artifact, so `Tsv.writeSingle` (coalesce-1) is the
  * right sink shape — the big data stays in the parquet/MTX exports.
  */
object TsvExports {

  /** `samples-cells.csv` — headerless `cells_id \t sample`
    * (`4_Prepare_experiment.r:168-173`: Cells_ID, Value). */
  def samplesCells(exp: Experiment, outDir: String): Unit =
    Tsv.writeSingle(
      exp.cells.select(col("cells_id"), col("sample")).orderBy("cells_id"),
      s"$outDir/samples-cells.csv", header = false)

  /** `metadata-cells.csv` — header `cells_id \t <vars...>`
    * (`4_Prepare_experiment.r:176-187`); written only when user
    * metadata columns exist, like the reference's `if("metadata" %in%
    * names(config))` guard. */
  def metadataCells(exp: Experiment, metadataCols: Seq[String], outDir: String): Unit =
    if (metadataCols.nonEmpty)
      Tsv.writeSingle(
        exp.cells
          .select((col("cells_id") +: metadataCols.map(col)): _*)
          .orderBy("cells_id"),
        s"$outDir/metadata-cells.csv", header = true)

  /** `r-out-cells.csv` — one `<sample>_<barcode>` cell name per line in
    * cells_id order (`4_Prepare_experiment.r:189-194`: colnames order). */
  def cellsList(exp: Experiment, outDir: String): Unit =
    Tsv.writeSingle(
      exp.cells.select(col("cell")).orderBy(col("cells_id")),
      s"$outDir/r-out-cells.csv", header = false)

  /** `r-out-annotations.csv` — headerless `input \t name \t
    * original_name`, restricted to genes actually kept in the matrix
    * (`4_Prepare_experiment.r:196-201`: `input %in% rownames`). The
    * kept-gene set is tiny relative to expr, so the semi join broadcasts. */
  def annotations(exp: Experiment, outDir: String): Unit = {
    val kept = exp.expr.select(col("gene").as("input")).distinct()
    Tsv.writeSingle(
      exp.genes
        .join(broadcast(kept), Seq("input"), "left_semi")
        .select("input", "name", "original_name")
        .orderBy("input"),
      s"$outDir/r-out-annotations.csv", header = false)
  }

  /** `df_flag_filtered.txt` — header `samples \t flag_filtered`, values
    * Filtered/Unfiltered (`3_Seurat.r:135-136`). */
  def flagFiltered(exp: Experiment, flagged: Seq[String], outDir: String): Unit = {
    val spark = exp.cells.sparkSession
    import spark.implicits._
    val flaggedSet = flagged.toSet
    val rows = exp.cells.select("sample").distinct()
      .collect().map(_.getString(0)).sorted
      .map(s => (s, if (flaggedSet(s)) "Filtered" else "Unfiltered"))
    Tsv.writeSingle(
      rows.toSeq.toDF("samples", "flag_filtered").orderBy("samples"),
      s"$outDir/df_flag_filtered.txt", header = true)
  }

  /** Write the whole suite. */
  def writeAll(exp: Experiment, metadataCols: Seq[String],
               flagged: Seq[String], outDir: String): Unit = {
    samplesCells(exp, outDir)
    metadataCells(exp, metadataCols, outDir)
    cellsList(exp, outDir)
    annotations(exp, outDir)
    flagFiltered(exp, flagged, outDir)
  }
}
