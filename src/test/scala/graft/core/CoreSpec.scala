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

  test("bucketed store: the cell-keyed join runs exchange-free") {
    val nCells = 200
    val exp = Experiment(
      expr = (0 until nCells).flatMap(i => (0 until 5).map(g =>
        (s"s${i % 2 + 1}", f"BC$i%04d", s"G$g", (i + g).toLong)))
        .toDF("sample", "barcode", "gene", "count"),
      cells = (0 until nCells).map(i =>
        (s"s${i % 2 + 1}", f"BC$i%04d", i.toLong))
        .toDF("sample", "barcode", "cells_id"),
      genes = Seq(("G1", "GeneOne")).toDF("input", "name"))
    val dir = java.nio.file.Files.createTempDirectory("bucketstore").toString
    ExperimentStore.saveBucketed(exp, dir, "bktspec", buckets = 4)
    // simulate a FRESH session: the writer's catalog entries are gone,
    // load must rebind the bucketed definition from the files alone
    spark.sql("DROP TABLE IF EXISTS bktspec_expr")
    spark.sql("DROP TABLE IF EXISTS bktspec_cells")
    val back = ExperimentStore.loadBucketed(spark, dir, "bktspec", buckets = 4)
    // the pipeline's hottest join shape: expr x cells on (sample,
    // barcode). Both sides are bucketed+sorted on the key, so the plan
    // must contain NO shuffle exchange — a SortMergeJoin (or AQE
    // conversion) straight over bucketed scans.
    // disable broadcast so the plan shows the shape that matters at
    // scale, where neither side fits an executor: SMJ over bucketed
    // scans with no shuffle
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      saved.foreach { case (k, _) => spark.conf.set(k, "-1") }
      val joined = back.expr.join(back.cells, Seq("sample", "barcode"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!p.contains("Exchange hashpartitioning"), p.take(3000))
      assert(p.contains("SortMergeJoin"), p.take(3000))
      assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
        p.take(3000))
      assert(joined.count() == nCells * 5)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    spark.sql("DROP TABLE IF EXISTS bktspec_expr")
    spark.sql("DROP TABLE IF EXISTS bktspec_cells")
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
