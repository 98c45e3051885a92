package graft.export

import graft.util.Json
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Stage-5 upload protocol (`5_Upload-to-aws.py:267-302`): two
  * key-value records — the experiment document into
  * `experiments-<env>` and the samples document into `samples-<env>` —
  * plus the cell-sets JSON object put under the experiment id
  * (`:289-291`). The engine carries the CONTRACT as a sink interface;
  * the reference's boto3 DynamoDB/S3 calls (2 items + 2 objects,
  * driver-side SDK per SURVEY §2.1) are one backend of it.
  *
  * [[HadoopFsSink]] is the bundled backend: it writes the same
  * payloads through the Hadoop FileSystem API, so every filesystem
  * scheme on Spark's classpath — `file://`, `hdfs://`, `s3a://` —
  * works unchanged; pointing it at an `s3a://` root IS the S3 object
  * sink, with no engine code knowing the difference.
  */
trait UploadSink {
  /** One key-value record (the DynamoDB `put_item` analog). */
  def putRecord(table: String, key: String, json: String): Unit
  /** One object body (the S3 `put_object` analog). */
  def putObject(bucket: String, key: String, bytes: Array[Byte]): Unit
}

/** Scheme-agnostic sink over `root` (e.g. `file:/tmp/out`,
  * `s3a://uploads`). Records land at `records/<table>/<key>.json`,
  * objects at `objects/<bucket>/<key>`. */
final class HadoopFsSink(root: String, conf: Configuration = new Configuration())
    extends UploadSink {

  private def write(path: Path, bytes: Array[Byte]): Unit = {
    val fs = FileSystem.get(path.toUri, conf)
    val out = fs.create(path, true)
    try out.write(bytes) finally out.close()
  }

  override def putRecord(table: String, key: String, json: String): Unit =
    write(new Path(s"$root/records/$table/$key.json"),
      json.getBytes("UTF-8"))

  override def putObject(bucket: String, key: String, bytes: Array[Byte]): Unit =
    write(new Path(s"$root/objects/$bucket/$key"), bytes)
}

/** The exact call surface a driver-side AWS SDK backend needs —
  * DynamoDB `put_item(TableName, Item)` and S3 `put_object(Bucket,
  * Key, Body)` argument shapes (`5_Upload-to-aws.py:267-302`). The SDK
  * itself stays out-of-engine (SURVEY §2.1, zero-egress build): in
  * production this is a thin DynamoDbClient/S3Client wrapper; in specs
  * an in-memory fake — either way the stage-5 contract runs through
  * the same [[Upload.uploadExperiment]] code path via [[ClientSink]]. */
trait KeyValueClient {
  def putItem(table: String, key: String, document: String): Unit
  def putObject(bucket: String, key: String, body: Array[Byte]): Unit
}

/** [[UploadSink]] over any [[KeyValueClient]]. */
final class ClientSink(client: KeyValueClient) extends UploadSink {
  override def putRecord(table: String, key: String, json: String): Unit =
    client.putItem(table, key, json)
  override def putObject(bucket: String, key: String, bytes: Array[Byte]): Unit =
    client.putObject(bucket, key, bytes)
}

/** AWS-SDK-shaped request/client surface — the argument shapes of
  * DynamoDB `PutItem` and S3 `PutObject` that the reference's boto3
  * calls produce (`5_Upload-to-aws.py:273,280,289-291,301`:
  * `Table(name).put_item(Item=document)`, `put_object(Body=, Bucket=,
  * Key=)`). The real SDK stays off the classpath (zero-egress build,
  * SURVEY §2.1 out-of-engine row); these traits mirror its call shapes
  * so the production wiring is a one-line delegation per method, and a
  * spec's in-memory fake exercises the identical code path. */
object aws {
  /** DynamoDB attribute value; the string (`S`) member is the only one
    * the stage-5 documents need. */
  final case class AttributeValue(s: String)
  /** `PutItem`: table name plus the item's attribute map. */
  final case class PutItemRequest(tableName: String,
                                  item: Map[String, AttributeValue])
  trait DynamoDbClient { def putItem(request: PutItemRequest): Unit }
  /** `PutObject`: bucket/key addressing; the body rides alongside. */
  final case class PutObjectRequest(bucket: String, key: String)
  trait S3Client {
    def putObject(request: PutObjectRequest, body: Array[Byte]): Unit
  }
}

/** [[KeyValueClient]] over the SDK-shaped clients: records become
  * DynamoDB items keyed by the table's `experimentId` partition key
  * with the document under `document` (the low-level-client encoding
  * of the reference's resource-API `put_item(Item=...)`), objects
  * become S3 puts. */
final class AwsSdkClient(dynamo: aws.DynamoDbClient, s3: aws.S3Client)
    extends KeyValueClient {
  override def putItem(table: String, key: String, document: String): Unit =
    dynamo.putItem(aws.PutItemRequest(table, Map(
      "experimentId" -> aws.AttributeValue(key),
      "document" -> aws.AttributeValue(document))))
  override def putObject(bucket: String, key: String, body: Array[Byte]): Unit =
    s3.putObject(aws.PutObjectRequest(bucket, key), body)
}

object Upload {

  /** The four puts of `5_Upload-to-aws.py:267-302`, driven off an
    * ingest [[graft.Ingest.Result]]: experiment record (`:273-278`,
    * apiVersion pinned to the reference's), samples record
    * (`:68` id convention `sample-<name>`), cell-sets object, and the
    * exported matrix object (`:301`, here the parquet/MTX export dir
    * path recorded as the object body reference). */
  def uploadExperiment(sink: UploadSink, result: graft.Ingest.Result,
                       experimentId: String, name: String,
                       organism: String = "hsapiens",
                       inputType: String = "10x", env: String = "production",
                       matrixObject: Option[Array[Byte]] = None): Unit = {
    val sampleNames = result.experiment.cells
      .select("sample").distinct()
      .collect().map(_.getString(0)).sorted
    val experimentJson = Json.write(Seq(
      "apiVersion" -> "2.0.0-data-ingest-seurat-rds-automated",
      "experimentId" -> experimentId,
      "experimentName" -> name,
      "meta" -> Seq("organism" -> organism, "type" -> inputType),
      "processingConfig" -> Json.Raw(result.processingConfig)))
    val samplesJson = Json.write(Seq(
      "experimentId" -> experimentId,
      "ids" -> sampleNames.map("sample-" + _).toSeq))
    sink.putRecord(s"experiments-$env", experimentId, experimentJson)
    sink.putRecord(s"samples-$env", experimentId, samplesJson)
    sink.putObject(s"cell-sets-$env", experimentId,
      result.cellSetsJson.getBytes("UTF-8"))
    matrixObject.foreach(bytes =>
      sink.putObject(s"biomage-source-$env", s"$experimentId/r.rds", bytes))
  }
}
