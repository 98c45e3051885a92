package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Scan-pruning data layout for large parquet tables.
  *
  * At 100 TB the dominant cost of a selective query is files/row-groups
  * READ, not rows processed: parquet row-group min/max statistics prune
  * at read time, but only if the writer clustered the data so key
  * ranges per file are narrow and disjoint. This writer produces that
  * layout with Spark's own machinery — `repartitionByRange` (one
  * range-exchange with a sampled boundary map) + `sortWithinPartitions`
  * (no extra shuffle) — so a later `WHERE key = x` / range predicate
  * touches one file's row groups instead of all of them.
  */
object Layout {

  /** Write `df` range-partitioned and internally sorted on `keys` into
    * `numFiles` files (± empty ranges). Every output file then covers a
    * narrow, non-overlapping key interval, which is exactly the
    * precondition for parquet stats pruning and for efficient
    * merge-style downstream reads. */
  def writeSorted(df: DataFrame, path: String, keys: Seq[String],
                  numFiles: Int): Unit =
    df.repartitionByRange(numFiles, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode("overwrite").parquet(path)

  /** Per-file [min, max] of `key` for a written layout — the
    * disjointness evidence (and the spec's assertion surface). */
  def fileRanges(spark: SparkSession, path: String,
                 key: String): Seq[(String, Long, Long)] = {
    // Hadoop FileSystem, not java.io.File: the writer above works on
    // any scheme on the classpath (file://, hdfs://, s3a://), so the
    // evidence reader must too
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(p)
      .map(_.getPath)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.toString).sorted.toSeq
    files.map { f =>
      val r = spark.read.parquet(f)
        .agg(org.apache.spark.sql.functions.min(col(key)),
          org.apache.spark.sql.functions.max(col(key)))
        .collect().head
      (f, r.getLong(0), r.getLong(1))
    }
  }
}
