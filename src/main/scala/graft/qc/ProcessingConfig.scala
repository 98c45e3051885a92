package graft.qc

import graft.util.Json
import org.apache.spark.sql.DataFrame

/** The processing-config document (`4_Prepare_experiment.r:338-357`):
  * per QC step — `{enabled, auto, filterSettings}` defaults plus a
  * `sample-<name>` block with that sample's resolved settings
  * (`add_custom_config_per_sample`, `:310-334`, which strips the
  * `auto`/`enabled` gates from the per-sample blocks). */
object ProcessingConfig {

  /** `settings` is QcSteps.runAll's per-step `(sample, key…)` tables;
    * the collect is #samples × #steps rows. */
  def build(configs: Map[String, StepConfig],
            settings: Map[String, DataFrame]): String = {
    val doc: Seq[(String, Any)] = QcSteps.all.map { step =>
      val cfg = configs.getOrElse(step.name, StepConfig())
      val resolved = settings.get(step.name).map { df =>
        df.collect().map { r =>
          val sample = r.getAs[String]("sample")
          val kv: Map[String, Any] = step.settingKeys
            .map(k => k -> r.getAs[Any](k)).toMap
          s"sample-$sample" -> Map("filterSettings" -> kv)
        }.toSeq.sortBy(_._1)
      }.getOrElse(Seq.empty)
      val base: Seq[(String, Any)] = Seq(
        "enabled" -> cfg.enabled,
        "auto" -> cfg.auto,
        "filterSettings" -> step.settingKeys
          .map(k => k -> cfg.settings.getOrElse(k, null)).toMap)
      step.name -> (base ++ resolved)
    }
    Json.write(doc)
  }
}
