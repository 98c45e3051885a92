package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10x Genomics / MatrixMarket sparse-matrix source and sink.
  *
  * Reference behavior being re-expressed (not ported):
  *  - `1_Preproc.r:97-147` — per-sample `Read10X`: MatrixMarket triples
  *    + barcodes + features, with Cell Ranger v2 (`genes.tsv`) vs v3
  *    (`features.tsv.gz`) layout detection at `1_Preproc.r:35-59`.
  *  - `4_Prepare_experiment.r:204-214` — transposed MTX export.
  *
  * Design: the mtx body is parsed with `spark.read.textFile` (gzip is
  * decoded transparently by the Hadoop codec, so the reference's
  * `.gz`-rename shim at `1_Preproc.r:122-126` has no equivalent here)
  * and joined positionally to the barcode/feature lookup tables, which
  * are line-number-indexed via `zipWithIndex` (file order = 1-based
  * MatrixMarket index). Lookups are broadcast when small; at 100 TB the
  * barcode join degrades gracefully to a shuffled hash join keyed by
  * cell ordinal. Text MTX is an interchange format — first thing a real
  * pipeline does is land the long table as Parquet partitioned by
  * sample.
  */
object Mtx {

  /** Detected Cell Ranger layout (`1_Preproc.r:35-59`). */
  sealed trait Layout { def featuresFile: String }
  case object V2 extends Layout { val featuresFile = "genes.tsv" }
  case object V3 extends Layout { val featuresFile = "features.tsv" }

  def detectLayout(spark: SparkSession, dir: String): Layout = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.globStatus(new Path(s"$dir/features.tsv*")).nonEmpty) V3
    else if (fs.globStatus(new Path(s"$dir/genes.tsv*")).nonEmpty) V2
    else throw new IllegalArgumentException(
      s"$dir: neither features.tsv* (v3) nor genes.tsv* (v2) present")
  }

  /** Resolve a glob to exactly ONE file — a dir holding both
    * `features.tsv` and `features.tsv.gz` would otherwise concatenate
    * both into the positional index and silently corrupt every id
    * past the first file. Plain file preferred over .gz. */
  private def resolveOne(spark: SparkSession, pattern: String): String = {
    val p = new Path(pattern)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matches = Option(fs.globStatus(p)).getOrElse(Array.empty)
      .map(_.getPath.toString).sorted
    matches.length match {
      case 0 => throw new IllegalArgumentException(s"no file matches $pattern")
      case 1 => matches.head
      case _ => matches.find(!_.endsWith(".gz")).getOrElse(matches.head)
    }
  }

  /** A TSV file as `(idx, c0, c1, ...)` where `idx` is the 1-based line
    * number — the positional id MatrixMarket triples refer to. */
  private def lookup(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val rows = spark.read.textFile(resolveOne(spark, path)).rdd.zipWithIndex().map {
      case (line, i) =>
        val parts = line.split("\t", -1)
        org.apache.spark.sql.Row.fromSeq(
          (i + 1L) +: cols.indices.map(j => if (j < parts.length) parts(j) else null))
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("idx", org.apache.spark.sql.types.LongType, nullable = false) +:
        cols.map(c => org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(rows, schema)
  }

  /** Raw MatrixMarket triples `(gene_idx, cell_idx, count)`, 1-based,
    * through the DSv2 `format("mtx")` source
    * ([[graft.sources.mtx.MtxDataSource]]): per-file comment/dims-line
    * handling, one partition per (gzip-unsplittable) file, and
    * projection pushdown into the parser. */
  def readMatrix(spark: SparkSession, path: String): DataFrame =
    spark.read.format("mtx").load(resolveOne(spark, path))

  /** Read one 10x sample directory → long table
    * `(sample, barcode, gene, count)` + feature annotations
    * `(input, name)`. `Read10X` semantics (`1_Preproc.r:129`): matrix
    * rows are features, columns are barcodes. */
  def read10x(spark: SparkSession, dir: String, sample: String): (DataFrame, DataFrame) = {
    val layout = detectLayout(spark, dir)
    val features = lookup(spark, s"$dir/${layout.featuresFile}*", Seq("input", "name"))
    val barcodes = lookup(spark, s"$dir/barcodes.tsv*", Seq("barcode"))
    val triples = readMatrix(spark, s"$dir/matrix.mtx*")
    val expr = triples
      .join(broadcast(features.select(col("idx").as("gene_idx"), col("input").as("gene"))), "gene_idx")
      .join(broadcast(barcodes.select(col("idx").as("cell_idx"), col("barcode"))), "cell_idx")
      .select(lit(sample).as("sample"), col("barcode"), col("gene"), col("count"))
    (expr, features.select("input", "name"))
  }

  /** Dense whitespace table → long form (`1_Preproc.r:150-159`, the
    * reference's untested non-10x path): first column = gene id,
    * remaining columns = barcodes; melted via `stack` so the output
    * matches the sparse reader's `(sample, barcode, gene, count)`
    * schema (zero entries dropped, keeping the long table sparse). */
  def readDense(spark: SparkSession, path: String, sample: String): DataFrame = {
    val raw = spark.read
      .option("sep", "\t").option("header", "true").csv(path)
    val geneCol = raw.columns.head
    val barcodes = raw.columns.tail
    val stackExpr = barcodes
      .map(b => s"'${b.replace("'", "''")}', cast(`$b` as long)")
      .mkString(s"stack(${barcodes.length}, ", ", ", ")")
    raw.select(col(geneCol).as("gene"),
        expr(s"$stackExpr as (barcode, count)"))
      .filter(col("count") > 0)
      .select(lit(sample).as("sample"), col("barcode"), col("gene"), col("count"))
  }

  /** Write a long table as MatrixMarket triples, transposed to
    * cells-as-rows like the reference export (`4_Prepare_experiment.r:204`:
    * `Matrix::t(...)`). `geneIdx`/`cellIdx` give the 1-based positional
    * ids (built by the caller from a deterministic ordinal — SURVEY
    * §2.10 convention: every ordinal comes from an explicit sort key).
    * Small-export path: single file, header first (`union` keeps
    * partition order, `coalesce(1)` concatenates in order). */
  def writeMtx(df: DataFrame, geneIdx: String, cellIdx: String,
               countCol: String, nGenes: Long, nCells: Long, path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val nnz = df.count()
    // Line order is part of the format, and union/coalesce partition
    // order is not a contract — so the order is made explicit with
    // sort keys and a single sorted partition.
    val header = spark.createDataset(Seq(
      (0, 0L, 0L, "%%MatrixMarket matrix coordinate integer general"),
      (0, 1L, 0L, s"$nCells $nGenes $nnz")))
      .toDF("section", "k1", "k2", "value")
    val body = df.select(lit(1).as("section"),
      col(cellIdx).as("k1"), col(geneIdx).as("k2"),
      format_string("%d %d %s", col(cellIdx), col(geneIdx), col(countCol))
        .as("value"))
    header.unionByName(body)
      .repartition(1)
      .sortWithinPartitions("section", "k1", "k2")
      .select("value")
      .write.mode("overwrite").text(path)
  }
}
