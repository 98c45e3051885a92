package graft.core

import org.apache.spark.sql.functions._

/** The reference's inline invariant suite (`src/test_object.r:4-50`,
  * executed on every run at `4_Prepare_experiment.r:153`), ported to
  * run against the `Experiment` handles. Returns violations instead of
  * throwing so the caller can report all at once. */
object Invariants {

  def check(exp: Experiment, minGenes: Long = 1): Seq[String] = {
    val out = Seq.newBuilder[String]

    // test_object.r:7-9 — object exists and has genes
    val nGenes = exp.genes.count()
    if (nGenes < minGenes) out += s"gene table has $nGenes rows (< $minGenes)"

    // test_object.r:14-24 — required metadata columns
    val required = Seq("sample", "barcode", "nCount", "nFeature",
      "percent_mt", "doublet_scores", "cells_id")
    val missing = required.filterNot(exp.cells.columns.contains)
    if (missing.nonEmpty) out += s"cells missing columns: ${missing.mkString(",")}"

    if (missing.isEmpty) {
      // test_object.r:26-29 — cells_id is exactly 0..n-1
      val n = exp.cells.count()
      val idAgg = exp.cells.agg(
        min("cells_id").as("mn"), max("cells_id").as("mx"),
        countDistinct("cells_id").as("d")).collect()(0)
      if (n > 0 && (idAgg.getLong(0) != 0L || idAgg.getLong(1) != n - 1 || idAgg.getLong(2) != n))
        out += s"cells_id not dense 0..${n - 1}: min=${idAgg.getLong(0)} max=${idAgg.getLong(1)} distinct=${idAgg.getLong(2)}"

      // test_object.r:31-36 — percent_mt is a 0-100 percent
      val bad = exp.cells.filter(col("percent_mt") < 0 || col("percent_mt") > 100).count()
      if (bad > 0) out += s"$bad cells with percent_mt outside [0,100]"
    }

    // test_object.r:40-48 — annotations aligned & names unique
    if (exp.genes.columns.contains("name")) {
      val dup = exp.genes.groupBy("name").count().filter(col("count") > 1).count()
      if (dup > 0) out += s"$dup duplicate gene names after dedup-rename"
    }
    val dupIn = exp.genes.groupBy("input").count().filter(col("count") > 1).count()
    if (dupIn > 0) out += s"$dupIn duplicate gene input ids"

    // expr references only known genes/cells
    val orphanGenes = exp.expr.join(exp.genes.select(col("input").as("gene")),
      Seq("gene"), "left_anti").count()
    if (orphanGenes > 0) out += s"$orphanGenes expr rows with unknown gene"

    out.result()
  }
}
