package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream

class MtxSpec extends SparkSpec {

  /** Tiny deterministic 10x fixture (FIXTURES.md §A style):
    * 4 genes × 3 barcodes, 6 nonzeros, two mito genes. */
  private def writeFixture(dir: Path, v2: Boolean = false, gz: Boolean = false): Unit = {
    def put(name: String, content: String): Unit =
      if (gz) {
        val out = new GZIPOutputStream(Files.newOutputStream(dir.resolve(name + ".gz")))
        out.write(content.getBytes("UTF-8")); out.close()
      } else Files.writeString(dir.resolve(name), content)
    put("matrix.mtx",
      """%%MatrixMarket matrix coordinate integer general
        |%generated fixture
        |4 3 6
        |1 1 5
        |2 1 5
        |1 2 10
        |3 2 20
        |4 2 10
        |3 3 1
        |""".stripMargin)
    put("barcodes.tsv", "AAA\nBBB\nCCC\n")
    put(if (v2) "genes.tsv" else "features.tsv",
      "ENSG1\tGeneA\nENSG2\tMT-CO1\nENSG3\tGeneB\nENSG4\tmt-nd1\n")
  }

  test("read10x parses v3 plain-text layout into the long table") {
    val dir = Files.createTempDirectory("mtx")
    writeFixture(dir)
    val (expr, features) = Mtx.read10x(spark, dir.toString, "s1")
    val rows = expr.collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(rows == Set(
      ("AAA", "ENSG1", 5L), ("AAA", "ENSG2", 5L),
      ("BBB", "ENSG1", 10L), ("BBB", "ENSG3", 20L), ("BBB", "ENSG4", 10L),
      ("CCC", "ENSG3", 1L)))
    assert(expr.select("sample").distinct().collect().map(_.getString(0)).toSeq == Seq("s1"))
    assert(features.count() == 4)
  }

  test("read10x handles v2 (genes.tsv) and gzipped files") {
    val dir = Files.createTempDirectory("mtx2")
    writeFixture(dir, v2 = true, gz = true)
    assert(Mtx.detectLayout(spark, dir.toString) == Mtx.V2)
    val (expr, _) = Mtx.read10x(spark, dir.toString, "s2")
    assert(expr.count() == 6)
    assert(expr.filter("barcode = 'BBB' AND gene = 'ENSG3'")
      .collect()(0).getAs[Long]("count") == 20L)
  }

  test("detectLayout rejects a directory with neither layout") {
    val dir = Files.createTempDirectory("mtx3")
    intercept[IllegalArgumentException](Mtx.detectLayout(spark, dir.toString))
  }

  test("readDense melts a whitespace table to sparse long form") {
    val dir = Files.createTempDirectory("dense")
    Files.writeString(dir.resolve("table.tsv"),
      "gene\tAAA\tBBB\nENSG1\t5\t0\nENSG2\t0\t7\n")
    val df = Mtx.readDense(spark, dir.resolve("table.tsv").toString, "sd")
    val rows = df.collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(rows == Set(("AAA", "ENSG1", 5L), ("BBB", "ENSG2", 7L)))
  }

  test("writeMtx → readMatrix roundtrip preserves triples (transposed)") {
    val dir = Files.createTempDirectory("mtxw").resolve("out")
    val df = {
      import spark.implicits._
      Seq((1L, 1L, 5L), (2L, 1L, 7L), (1L, 3L, 2L))
        .toDF("cell_idx", "gene_idx", "count")
    }
    Mtx.writeMtx(df, "gene_idx", "cell_idx", "count",
      nGenes = 3, nCells = 2, path = dir.toString)
    val back = Mtx.readMatrix(spark, dir.toString + "/*.txt")
    // written transposed: rows are cells
    val triples = back.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(triples == Set((1L, 1L, 5L), (2L, 1L, 7L), (1L, 3L, 2L)))
    val first = spark.read.textFile(dir.toString + "/*.txt").first()
    assert(first.startsWith("%%MatrixMarket"))
  }
}
