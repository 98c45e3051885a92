package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-metadata operator (`5_Upload-to-aws.py:92-104`): list a
  * directory into a DataFrame with size, mtime and extension-derived
  * MIME type, excluding hidden files (`:92-96`). Driver-side Hadoop
  * `listStatus` → DataFrame, so the same code reads local FS, HDFS or
  * s3a. */
object FileMeta {

  /** Extension → MIME (the reference's table at `5_Upload-to-aws.py:71-75`
    * generalized). */
  val MimeByExt: Map[String, String] = Map(
    "json" -> "application/json", "csv" -> "text/csv", "tsv" -> "text/tab-separated-values",
    "txt" -> "text/plain", "gz" -> "application/gzip", "mtx" -> "text/plain",
    "rds" -> "application/octet-stream", "parquet" -> "application/octet-stream")

  def list(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(new Path(dir)).toSeq
      .filter(s => !s.getPath.getName.startsWith("."))
      .map { s =>
        val name = s.getPath.getName
        val ext = name.split('.').lastOption.getOrElse("").toLowerCase
        (s.getPath.toString, name, s.getLen, s.getModificationTime,
          MimeByExt.getOrElse(ext, "application/octet-stream"))
      }
    entries.toDF("path", "name", "size", "mtime_ms", "mime")
      .orderBy("name")
  }
}
