package graft.qc

import graft.SparkSpec
import graft.sources.FileMeta
import java.nio.file.Files

class PlotDataSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cells = Seq(
    ("s1", "A", 150L, 30L), ("s1", "B", 260L, 45L), ("s1", "C", 255L, 44L),
    ("s2", "D", 90L, 12L),
  ).toDF("sample", "barcode", "nCount", "nFeature")

  test("histogram bins with fixed step, per sample") {
    val h = PlotData.histogram(cells, "nCount", binStep = 100).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(h == Map(("s1", 1L) -> 1L, ("s1", 2L) -> 2L, ("s2", 0L) -> 1L))
  }

  test("rank curve ranks within sample by descending count") {
    val rc = PlotData.rankCurve(cells).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rc.contains(("s1", 260L, 1L)) && rc.contains(("s1", 255L, 2L)) &&
      rc.contains(("s1", 150L, 3L)) && rc.contains(("s2", 90L, 1L)))
  }

  test("genesVsUmis emits log10 scatter pairs") {
    val g = PlotData.genesVsUmis(cells).collect()
    assert(g.length == 4)
    val a = g.find(_.getString(1) == "A").get
    assert(math.abs(a.getDouble(2) - math.log10(150)) < 1e-12)
  }

  test("FileMeta lists visible files with MIME, hidden excluded") {
    val dir = Files.createTempDirectory("files")
    Files.writeString(dir.resolve("data.tsv"), "a\tb\n")
    Files.writeString(dir.resolve("cfg.json"), "{}")
    Files.writeString(dir.resolve(".hidden"), "x")
    val rows = FileMeta.list(spark, dir.toString).collect()
    assert(rows.map(_.getAs[String]("name")).toSeq == Seq("cfg.json", "data.tsv"))
    val byName = rows.map(r => r.getAs[String]("name") -> r.getAs[String]("mime")).toMap
    assert(byName("data.tsv") == "text/tab-separated-values")
    assert(byName("cfg.json") == "application/json")
    assert(rows.forall(_.getAs[Long]("size") > 0))
  }
}
