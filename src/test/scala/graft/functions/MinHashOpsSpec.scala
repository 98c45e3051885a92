package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Round-9 scratch-fix expressions: the row-local MinHash signature
  * and the row-local multiset-intersection count that replaced the
  * exploded (doc_id, hm) relation's exchanges (the LSH branch alone
  * exhausted 83 GB of scratch at 5M docs — SOAK_corpus.md). */
class MinHashOpsSpec extends SparkSpec {
  import spark.implicits._

  private def hmaOf(v: Long*) = Literal.create(v.toArray,
    ArrayType(LongType, containsNull = false))

  test("native minhash sig equals the k-pass HOF fold and the old aggregate form") {
    val docs = (0 until 120).map { d =>
      (d.toLong, (0 until 10 + d % 37).map(i =>
        math.abs((d * 1315423911L + i * 2654435761L) % TextFunctions.MinHashP)).toArray)
    }.toDF("doc_id", "hma")
    // HOF fallback form (what a session without the extensions runs)
    val hof = array(TextFunctions.MinHashCoeffs.indices.map(j =>
      array_min(transform(col("hma"), h => TextFunctions.minHashJ(h, j)))): _*)
    val rows = docs.select(
      call_function("graft_minhash_sig", col("hma")).as("n"), hof.as("h")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r))
    // and against the exploded min() aggregation the r8 engine used
    val mins = TextFunctions.MinHashCoeffs.indices.map(j =>
      min(TextFunctions.minHashJ(col("hm"), j)).as(s"m$j"))
    val agg = docs.select(col("doc_id"), explode(col("hma")).as("hm"))
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
    val nat = docs.select(col("doc_id"),
        call_function("graft_minhash_sig", col("hma")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    agg.collect().foreach { r =>
      val sig = (1 to TextFunctions.MinHashCoeffs.length).map(r.getLong)
      assert(nat(r.getLong(0)) == sig, s"doc ${r.getLong(0)}")
    }
  }

  test("minhash sig: interpreted eval matches codegen; empty array -> empty sig") {
    val e = MinHashSig(hmaOf(7L, 99L, 12345L, 7L))
    val interpreted = e.eval(null).asInstanceOf[ArrayData].toLongArray.toSeq
    val viaPlan = spark.range(1)
      .select(call_function("graft_minhash_sig",
        typedLit(Seq(7L, 99L, 12345L, 7L)))).collect()(0).getSeq[Long](0)
    assert(interpreted == viaPlan)
    assert(MinHashSig(hmaOf()).eval(null)
      .asInstanceOf[ArrayData].numElements() == 0)
    // the HOF fallback agrees on empty input too
    val fb = spark.range(1).select(
      when(size(typedLit(Seq.empty[Long])) === 0, array().cast("array<long>"))
        .otherwise(array(lit(1L)))).collect()(0).getSeq[Long](0)
    assert(fb.isEmpty)
  }

  test("minter counts multiset intersection like the exploded join, incl. duplicates") {
    // reference: Σ_h mult_a(h)·mult_b(h) via a literal join count
    def ref(a: Seq[Long], b: Seq[Long]): Long =
      a.map(h => b.count(_ == h).toLong).sum
    val cases = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),          // plain sets: 2
      (Seq(1L, 1L, 2L), Seq(1L, 3L)),              // dup in a: 2
      (Seq(1L, 1L), Seq(1L, 1L, 1L)),              // dups both sides: 6
      (Seq.empty[Long], Seq(1L, 2L)),              // empty: 0
      (Seq(5L), Seq.empty[Long]),                  // empty: 0
      ((1L to 200L).toSeq, (150L to 400L).toSeq))  // overlap run: 51
    cases.foreach { case (a, b) =>
      val got = MultisetIntersect(
        hmaOf(a: _*), hmaOf(b: _*)).eval(null).asInstanceOf[Long]
      assert(got == ref(a, b), s"a=$a b=$b")
      // codegen path through a plan
      val planned = spark.range(1)
        .select(call_function("graft_minter", typedLit(a), typedLit(b)))
        .collect()(0).getLong(0)
      assert(planned == ref(a, b), s"plan a=$a b=$b")
      // HOF fallback form
      val fb = spark.range(1).select(
        aggregate(typedLit(a), lit(0L),
          (acc, h) => acc + size(filter(typedLit(b), x => x === h)).cast("long")))
        .collect()(0).getLong(0)
      assert(fb == ref(a, b), s"fallback a=$a b=$b")
    }
  }
}
