package graft.operators

import graft.SparkSpec
import graft.core.Tables

class IvfSpec extends SparkSpec {

  private lazy val t = Tables(spark, "/root/testdata/sf0.001")

  test("IVF top-k: high recall vs the brute-force baseline, exact scores") {
    val exact = Similarity.bruteForceTopK(t, nQueries = 5, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("cos")).toMap
    val ivf = Similarity.ivfTopK(t, nQueries = 5, k = 10, nlist = 8, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("cos")).toMap
    val recall = ivf.keySet.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.5, s"recall@10 = $recall")
    // where IVF returns a pair the brute force also found, the cosine
    // must be IDENTICAL (same formula, only the candidate set differs)
    ivf.foreach { case (pair, c) =>
      exact.get(pair).foreach(e => assert(e == c, s"$pair: $e != $c"))
    }
  }

  test("IVF is deterministic (seeded k-means + ordered probes)") {
    val a = Similarity.ivfTopK(t, nQueries = 3, k = 5).collect().toSeq
    val b = Similarity.ivfTopK(t, nQueries = 3, k = 5).collect().toSeq
    assert(a == b)
  }

  test("kmeans cells partition the corpus: counts sum to |corpus|, ids in range") {
    val total = t.embeddings.count()
    val cells = Similarity.kmeansCells(t, nlist = 8).collect()
    assert(cells.map(_.getAs[Long]("n")).sum == total)
    assert(cells.map(_.getAs[Int]("cell")).distinct.length == cells.length)
    cells.foreach { r =>
      assert(r.getAs[Long]("min_vec") <= r.getAs[Long]("max_vec"))
    }
    // deterministic across invocations (seeded sample + seeded k-means)
    val again = Similarity.kmeansCells(t, nlist = 8).collect()
    assert(cells.toSeq == again.toSeq)
  }
}
