package graft.core

import graft.SparkSpec

class CoreSpec extends SparkSpec {
  import spark.implicits._

  test("ExperimentStore round-trips the three handles") {
    val exp = Experiment(
      expr = Seq(("s1", "A", "G1", 3L), ("s2", "B", "G1", 5L))
        .toDF("sample", "barcode", "gene", "count"),
      cells = Seq(("s1", "A", 0L), ("s2", "B", 1L))
        .toDF("sample", "barcode", "cells_id"),
      genes = Seq(("G1", "GeneOne")).toDF("input", "name"))
    val dir = java.nio.file.Files.createTempDirectory("expstore").toString
    ExperimentStore.save(exp, dir)
    val back = ExperimentStore.load(spark, dir)
    assert(back.expr.count() == 2 && back.cells.count() == 2 && back.genes.count() == 1)
    // partition pruning is available on the sample axis
    val pruned = back.expr.filter("sample = 's1'")
    assert(pruned.count() == 1)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }

  test("MetaConfig parses the reference meta.json shape") {
    val cfg = MetaConfig.parse(
      """{"name": "exp1", "organism": "mmusculus",
        |  "input": {"type": "10x"},
        |  "samples": ["s1", "s2"],
        |  "metadata": {"condition": {"s1": "ctrl", "s2": "treat"}}}""".stripMargin)
    assert(cfg.name == "exp1")
    assert(cfg.organism.contains("mmusculus"))
    assert(cfg.inputType == "10x")
    assert(cfg.samples == Seq("s1", "s2"))
    assert(cfg.metadata == Map("condition" -> Map("s1" -> "ctrl", "s2" -> "treat")))
  }

  test("MetaConfig defaults for absent optional fields") {
    val cfg = MetaConfig.parse("""{"samples": ["a"]}""")
    assert(cfg.name == "experiment" && cfg.organism.isEmpty && cfg.inputType == "10x")
    assert(cfg.metadata.isEmpty)
  }
}
