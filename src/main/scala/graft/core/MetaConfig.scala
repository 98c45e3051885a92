package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** `meta.json` codec (`1_Preproc.r:166`; shape at `help.r:35`,
  * `5_Upload-to-aws.py:59,230`): experiment name, organism, input
  * type, sample list, and optional per-sample user metadata
  * `metadata: {column: {sample: value}}`. Parsed with the Jackson that
  * ships on the Spark classpath — driver-side, the document is tiny. */
final case class MetaConfig(
    name: String,
    organism: Option[String],
    inputType: String,
    samples: Seq[String],
    metadata: Map[String, Map[String, String]])

object MetaConfig {

  def parse(json: String): MetaConfig = {
    val root = new ObjectMapper().readTree(json)
    def optText(field: String): Option[String] =
      Option(root.get(field)).filterNot(_.isNull).map(_.asText)
    val samples = Option(root.get("samples")).map(_.elements().asScala.map(_.asText).toSeq)
      .getOrElse(Seq.empty)
    val metadata = Option(root.get("metadata")).map { m =>
      m.properties().asScala.map { e =>
        e.getKey -> e.getValue.properties().asScala
          .map(s => s.getKey -> s.getValue.asText).toMap
      }.toMap
    }.getOrElse(Map.empty[String, Map[String, String]])
    MetaConfig(
      name = optText("name").getOrElse("experiment"),
      organism = optText("organism"),
      inputType = Option(root.at("/input/type")).filterNot(_.isMissingNode)
        .map(_.asText).filter(_.nonEmpty).getOrElse("10x"),
      samples = samples,
      metadata = metadata)
  }

  def read(path: String): MetaConfig =
    parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}
