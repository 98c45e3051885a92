package graft.operators

import graft.SparkSpec
import graft.export.CellSets
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("DenseId: contiguous 0..n-1 in sort order, distributed") {
    val df = (0 until 1000).map(i => (s"s${i % 3}", f"bc$i%04d"))
      .toDF("sample", "barcode").repartition(7)
    val ids = DenseId.withDenseId(df, Seq(col("sample"), col("barcode")), "id")
    val collected = ids.orderBy("sample", "barcode").collect().map(_.getAs[Long]("id"))
    assert(collected.sameElements(0L until 1000L))
  }

  test("DenseId matches row_number window semantics (Q21 equivalence)") {
    val df = Seq("c", "a", "b").toDF("k")
    val ids = DenseId.withDenseId(df, Seq(col("k")), "id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ids == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }

  test("dedupGeneNames renames only duplicates, keeps original_name") {
    val genes = Seq(
      ("ENSG1", "Alpha"), ("ENSG2", "Beta"),
      ("ENSG3", "Alpha"), ("ENSG4", "Gamma"),
    ).toDF("input", "name")
    val out = MergeSamples.dedupGeneNames(genes).collect()
      .map(r => r.getAs[String]("input") ->
        ((r.getAs[String]("name"), r.getAs[String]("original_name")))).toMap
    assert(out("ENSG1") == (("Alpha - ENSG1", "Alpha")))
    assert(out("ENSG3") == (("Alpha - ENSG3", "Alpha")))
    assert(out("ENSG2") == (("Beta", "Beta")))
    // uniqueness invariant (test_object.r:47)
    val names = out.values.map(_._1).toSeq
    assert(names.distinct.size == names.size)
  }

  test("withCellName prefixes sample (RenameCells semantics)") {
    val df = Seq(("s1", "AAA"), ("s2", "AAA")).toDF("sample", "barcode")
    val cells = MergeSamples.withCellName(df).collect().map(_.getAs[String]("cell")).toSet
    assert(cells == Set("s1_AAA", "s2_AAA"))
  }

  test("cell sets: sorted member ids, deterministic distinct colors") {
    val cells = Seq(
      ("s1", 0L), ("s2", 1L), ("s1", 2L), ("s2", 3L), ("s1", 4L),
    ).toDF("sample", "cells_id")
    val sets = CellSets.fromColumn(cells, "sample", "sample")
    val rows = sets.orderBy("key").collect()
    assert(rows.map(_.getAs[String]("key")).toSeq == Seq("sample-s1", "sample-s2"))
    assert(rows(0).getSeq[Long](3) == Seq(0L, 2L, 4L))
    assert(rows(1).getSeq[Long](3) == Seq(1L, 3L))
    val colors = rows.map(_.getAs[String]("color"))
    assert(colors.distinct.length == 2 && colors.forall(_.matches("#[0-9a-f]{6}")))
    val json = CellSets.toJsonDocument(sets, "sample", "Samples")
    assert(json.contains("\"rootNode\":true") && json.contains("sample-s1"))
  }

  test("k-th group gets the reference pool's k-th color") {
    // head of the reference color_pool.json (405 fixed values, popped
    // positionally at 5_Upload-to-aws.py:150,191)
    val head = Seq("#e377c2", "#8c564b", "#d62728", "#2ca02c", "#ff7f0e")
    assert(CellSets.colorPool(5) == head)
    assert(CellSets.colorPool(405).length == 405)
    assert(CellSets.colorPool(405).distinct.length == 405)
    // past the reference pool the golden-angle extension keeps going
    val ext = CellSets.colorPool(410)
    assert(ext.take(405) == CellSets.colorPool(405))
    assert(ext.drop(405).forall(_.matches("#[0-9a-f]{6}")))
    // and the k-th group by sort order wears the k-th color
    val cells = Seq(("a", 0L), ("b", 1L), ("c", 2L)).toDF("grp", "cells_id")
    val got = CellSets.fromColumn(cells, "grp", "g").orderBy("key")
      .collect().map(_.getAs[String]("color")).toSeq
    assert(got == head.take(3))
  }
}
