package graft.ml

import graft.SparkSpec

class DoubletsSpec extends SparkSpec {
  import spark.implicits._

  /** Two well-separated expression clusters + 3 planted doublets that
    * are true mixtures: the SUM of an A-profile and a B-profile, so
    * they carry both the mixed program AND the ~2x library a real
    * doublet has. Cross-cluster artificial doublets land where the
    * planted cells live, so their neighborhoods are artificial-enriched
    * and the classifier sees both of its signals. */
  private def fixture = {
    val clusterA = (0 until 30).flatMap { i =>
      (0 until 8).map(g => ("s1", f"a$i%02d", s"gA$g", 20L + (i % 3)))
    }
    val clusterB = (0 until 30).flatMap { i =>
      (0 until 8).map(g => ("s1", f"b$i%02d", s"gB$g", 20L + (i % 3)))
    }
    val planted = (0 until 3).flatMap { i =>
      (0 until 8).map(g => ("s1", s"dbl$i", s"gA$g", 20L + i)) ++
        (0 until 8).map(g => ("s1", s"dbl$i", s"gB$g", 20L + i))
    }
    (clusterA ++ clusterB ++ planted).toDF("sample", "barcode", "gene", "count")
  }

  test("planted doublets score higher than cluster members") {
    val res = Doublets.scores(fixture, k = 10, numHvg = 16, numPcs = 5)
      .collect().map(r => r.getAs[String]("barcode") ->
        ((r.getAs[Double]("doublet_scores"), r.getAs[String]("doublet_class")))).toMap
    assert(res.size == 63)
    val planted = res.filter(_._1.startsWith("dbl")).values.map(_._1)
    val members = res.filter(k => k._1.startsWith("a") || k._1.startsWith("b")).values.map(_._1)
    assert(planted.min > members.sum / members.size,
      s"planted min ${planted.min} vs member mean ${members.sum / members.size}")
    assert(res("dbl0")._2 == "doublet")
    res.values.foreach { case (s, c) =>
      assert(s >= 0.0 && s <= 1.0 && (c == "singlet" || c == "doublet"))
    }
  }

  test("deterministic across invocations") {
    val a = Doublets.scores(fixture, k = 10, numHvg = 16, numPcs = 5)
      .collect().map(r => (r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq
    val b = Doublets.scores(fixture, k = 10, numHvg = 16, numPcs = 5)
      .collect().map(r => (r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
