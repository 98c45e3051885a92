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
}
