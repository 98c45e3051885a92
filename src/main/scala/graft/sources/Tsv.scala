package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TSV read/write — the reference's `read.delim`/`fread`/`write.table`
  * surface (`3_Seurat.r:67`, `help.r:10-13`, `4_Prepare_experiment.r:
  * 168-201`, `1_Preproc.r:146`). Thin wrappers so every call site gets
  * the same dialect (tab separator, optional header, no quoting
  * surprises). */
object Tsv {

  def read(spark: SparkSession, path: String, header: Boolean = true,
           inferSchema: Boolean = false): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(path)

  /** Small-output sink (the reference's exports are single files read
    * by downstream tools): one part, deterministic row order must be
    * imposed by the caller via orderBy before the call. */
  def writeSingle(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.coalesce(1).write
      .option("sep", "\t")
      .option("header", header.toString)
      .mode("overwrite")
      .csv(path)
}
