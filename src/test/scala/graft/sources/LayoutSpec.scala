package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class LayoutSpec extends SparkSpec {

  test("writeSorted produces disjoint per-file key ranges (the pruning precondition)") {
    val dir = Files.createTempDirectory("layout").toString + "/lineitem"
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Layout.writeSorted(src, dir, Seq("l_orderkey"), numFiles = 4)
    val ranges = Layout.fileRanges(spark, dir, "l_orderkey")
      .map { case (_, lo, hi) => (lo, hi) }.sortBy(_._1)
    assert(ranges.size >= 2, s"expected multiple files, got $ranges")
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping file ranges: $ranges")
      case _ =>
    }
    // nothing lost or duplicated by the re-layout
    assert(spark.read.parquet(dir).count() == src.count())
  }

  test("fileRanges resolves scheme-qualified paths through the Hadoop FS API") {
    val dir = Files.createTempDirectory("layout3").toString + "/lineitem"
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Layout.writeSorted(src, dir, Seq("l_orderkey"), numFiles = 2)
    // same layout read via an explicit file:// URI (the HDFS/S3A shape)
    // and via the bare local path must agree
    val bare = Layout.fileRanges(spark, dir, "l_orderkey")
      .map { case (_, lo, hi) => (lo, hi) }
    val uri = Layout.fileRanges(spark, "file://" + dir, "l_orderkey")
      .map { case (_, lo, hi) => (lo, hi) }
    assert(bare.nonEmpty && bare == uri, s"bare=$bare uri=$uri")
  }

  test("a point lookup on the layout key prunes to a single file's range") {
    val dir = Files.createTempDirectory("layout2").toString + "/lineitem"
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Layout.writeSorted(src, dir, Seq("l_orderkey"), numFiles = 4)
    val ranges = Layout.fileRanges(spark, dir, "l_orderkey")
    val probe = ranges.head._3 // max key of the first file
    // only one file's [min,max] interval can contain the probe when
    // ranges are disjoint — the stats-pruning win at scale
    val containing = ranges.count { case (_, lo, hi) => lo <= probe && probe <= hi }
    assert(containing == 1, s"probe $probe in $containing files: $ranges")
    // and the predicate is pushed to the scan for row-group pruning
    val p = spark.read.parquet(dir).filter(s"l_orderkey = $probe")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters:") && p.contains("EqualTo(l_orderkey"), p.take(1500))
  }
}
