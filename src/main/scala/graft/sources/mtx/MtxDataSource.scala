package graft.sources.mtx

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 reader for the MatrixMarket coordinate body —
  * `spark.read.format("mtx").load(path)` → `(gene_idx, cell_idx,
  * count)` triples, 1-based, comments and the dims line skipped
  * per-file.
  *
  * Re-expresses the `Read10X` matrix ingestion (`1_Preproc.r:129`) as a
  * first-class Spark source (SURVEY §7.3's declared follow-up to the
  * text-parse path): one `InputPartition` per file — 10x bodies ship
  * gzipped, and gzip streams are not splittable, so a file is the
  * honest unit of parallelism; a multi-sample load parallelizes across
  * its files. Projection pushdown ([[SupportsPushDownRequiredColumns]])
  * reaches the parser: only requested triple fields are materialized,
  * and a `count(*)` scan emits zero-field rows.
  */
object MtxDataSource {
  /** Fixed triple schema of a MatrixMarket coordinate body. */
  val Schema: StructType = StructType(Seq(
    StructField("gene_idx", LongType, nullable = false),
    StructField("cell_idx", LongType, nullable = false),
    StructField("count", LongType, nullable = false)))
}

class MtxDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "mtx"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MtxDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val single = Option(properties.get("path")).toSeq
    val multi = Option(properties.get("paths")).toSeq.flatMap { json =>
      // Spark encodes multi-path loads as a JSON string array
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(json, classOf[Array[String]]).toSeq
    }
    val paths = single ++ multi
    require(paths.nonEmpty, "mtx source requires a path")
    new MtxTable(paths)
  }
}

class MtxTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"mtx(${paths.mkString(",")})"
  override def schema(): StructType = MtxDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MtxScanBuilder(paths)
}

class MtxScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = MtxDataSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    // driver-side glob/dir expansion → a flat file list, one partition
    // each (gzip text is not splittable)
    val files = paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      Option(fs.globStatus(hp)).getOrElse(Array.empty).toSeq.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filterNot(_.isDirectory)
        else Seq(st)
      }.map(_.getPath.toString)
    }.distinct.sorted
    // ship the FULL Hadoop conf via the standard serializable wrapper —
    // a prefix-filtered subset would drop e.g. hadoop.security.* and
    // credential-provider keys and break reads on secured clusters
    new MtxScan(files, required, new SerializableConfiguration(conf))
  }
}

class MtxScan(files: Seq[String], required: StructType,
              conf: SerializableConfiguration) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"mtx files=${files.length} ReadSchema: ${required.simpleString}"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(MtxInputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    MtxReaderFactory(required, conf)
}

case class MtxInputPartition(path: String) extends InputPartition

case class MtxReaderFactory(required: StructType, conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new MtxPartitionReader(
      partition.asInstanceOf[MtxInputPartition].path, required, conf)
}

/** Streams one (possibly gzipped) MatrixMarket file: `%` comments and
  * blank lines dropped; the first surviving line is the dims header
  * (syntactically indistinguishable from a triple, identified
  * positionally exactly like the reference's reader); every other line
  * parses to the projected subset of `(gene_idx, cell_idx, count)`. */
class MtxPartitionReader(path: String, required: StructType,
                         sConf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private val conf = sConf.value
  private val p = new Path(path)
  private val reader = {
    val fs = p.getFileSystem(conf)
    val raw = fs.open(p)
    val codec = new CompressionCodecFactory(conf).getCodec(p)
    val in = if (codec == null) raw else codec.createInputStream(raw)
    new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
  }
  // projected column → its index in the whitespace-split triple
  private val fieldIdx: Array[Int] =
    required.fieldNames.map(MtxDataSource.Schema.fieldIndex)
  private var headerSkipped = false
  private var current: InternalRow = _

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null) {
      val t = line.trim
      if (t.nonEmpty && !t.startsWith("%")) {
        if (!headerSkipped) headerSkipped = true
        else {
          val parts = t.split("\\s+")
          val row = new GenericInternalRow(fieldIdx.length)
          var i = 0
          while (i < fieldIdx.length) {
            row.update(i, java.lang.Long.parseLong(parts(fieldIdx(i))))
            i += 1
          }
          current = row
          return true
        }
      }
      line = reader.readLine()
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
