package graft.core

import org.apache.spark.sql.SparkSession

/** Parquet persistence of an [[Experiment]] (SURVEY §1.4: the directory
  * layout replacing the reference's RDS checkpoints at `1_Preproc.r:174`,
  * `3_Seurat.r:125`, `4_Prepare_experiment.r:161`). `expr` is
  * partitioned by sample so per-sample stages get partition pruning. */
object ExperimentStore {

  def save(exp: Experiment, dir: String): Unit = {
    exp.expr.write.mode("overwrite").partitionBy("sample").parquet(s"$dir/expr")
    exp.cells.write.mode("overwrite").parquet(s"$dir/cells")
    exp.genes.write.mode("overwrite").parquet(s"$dir/genes")
  }

  def load(spark: SparkSession, dir: String): Experiment =
    Experiment(
      expr = spark.read.parquet(s"$dir/expr"),
      cells = spark.read.parquet(s"$dir/cells"),
      genes = spark.read.parquet(s"$dir/genes"))

  /** Bucketed variant: `expr` and `cells` are bucketed AND sorted on
    * the join key `(sample, barcode)`, so every downstream cell-keyed
    * join (metrics joins, score joins, QC filters — the pipeline's
    * hottest shape) runs exchange-free: both sides scan pre-sorted
    * buckets and merge directly. At cluster scale this removes the
    * largest repeated shuffle in the lifecycle; `buckets` should be
    * sized so one bucket of `expr` fits an executor core (~128 MB).
    * Tables are EXTERNAL (data under `dir`); genes stays a plain
    * parquet — it is broadcast-sized by construction.
    *
    * Trade-off vs [[save]]: bucket layout replaces the per-sample
    * directory partitioning, so per-sample stages filter rows instead
    * of pruning directories. Use [[save]] when the per-sample stages
    * dominate; the bucketed store when the cell-keyed joins do. */
  def saveBucketed(exp: Experiment, dir: String, prefix: String,
                   buckets: Int = 32): Unit = {
    def bucketed(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.write.mode("overwrite").format("parquet")
        .option("path", s"$dir/$name")
        .bucketBy(buckets, "sample", "barcode")
        .sortBy("sample", "barcode")
        .saveAsTable(s"${prefix}_$name")
    bucketed(exp.expr, "expr")
    bucketed(exp.cells, "cells")
    exp.genes.write.mode("overwrite").parquet(s"$dir/genes")
  }

  /** Bucket metadata lives in the catalog, which for the default
    * in-memory catalog dies with the writing session — so load REBINDS
    * the external table definition from `(dir, prefix)` (schema read
    * from the files, bucket spec re-declared with the SAME `buckets`
    * the writer used), dropping any stale same-name binding. Works in
    * the writing session and in a fresh one. */
  def loadBucketed(spark: SparkSession, dir: String, prefix: String,
                   buckets: Int = 32): Experiment = {
    def bind(name: String): org.apache.spark.sql.DataFrame = {
      val tbl = s"${prefix}_$name"
      val ddl = spark.read.parquet(s"$dir/$name").schema.toDDL
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(
        s"""CREATE TABLE $tbl ($ddl) USING parquet
           |CLUSTERED BY (sample, barcode)
           |SORTED BY (sample, barcode) INTO $buckets BUCKETS
           |LOCATION '$dir/$name'""".stripMargin)
      spark.table(tbl)
    }
    Experiment(
      expr = bind("expr"),
      cells = bind("cells"),
      genes = spark.read.parquet(s"$dir/genes"))
  }
}
