package graft.operators

import graft.SparkSpec
import graft.core.Tables
import graft.ml.QualityClassifier
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Round-11 specs: x63 mixture materialization (hand-pinned coin
  * semantics) and the fit-once model artifacts — LmModel (x39/x40),
  * DsirModel (x36), and the quality-classifier weight persistence
  * (x45) — each pinned against its per-call gate form and through a
  * parquet round-trip (the buildPqIndex/SimilaritySpec discipline). */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The engine's hash60: first 15 md5 hex chars as a long. */
  private def hash60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("r11text").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- x63 mixture materialization ---------------------------------------

  test("x63: copy counts equal floor(boost) + the hand-computed hash coin, epochs contiguous, boost<1 thins") {
    // srcSmall: 1 doc x 10 tokens; srcBig: 9 docs x 10 tokens — the x43
    // fixture: boost(small) ≈ 1.768 (repeat branch), boost(big) ≈ 0.915
    // (thin branch).
    val ten = (1 to 10).map(i => s"t$i").mkString(" ")
    val rows = Seq((0L, ten, "srcSmall")) ++
      (1 to 9).map(i => (i.toLong, ten, "srcBig"))
    val t = Tables(spark, docsDir(rows))

    // hand-compute the per-source boost exactly as mixtureWeights does
    val ta = math.pow(10, 0.7) + math.pow(90, 0.7)
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val boost = Map(
      "srcSmall" -> round6((math.pow(10, 0.7) / ta) / 0.1),
      "srcBig" -> round6((math.pow(90, 0.7) / ta) / 0.9))
    assert(boost("srcSmall") > 1.0 && boost("srcBig") < 1.0)

    def expectedCopies(id: Long, src: String): Long = {
      val b = boost(src)
      val frac = math.round((b - math.floor(b)) * 1e6)
      math.floor(b).toLong +
        (if (hash60(s"mix_$id") % 1000000L < frac) 1L else 0L)
    }

    val got = TextQueries.mixtureMaterialize(t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byDoc = got.groupBy(_._1)
    rows.foreach { case (id, _, src) =>
      val exp = expectedCopies(id, src)
      val eps = byDoc.get(id).map(_.map(_._4).sorted.toSeq).getOrElse(Seq.empty)
      assert(eps == (0L until exp),
        s"doc $id from $src: expected $exp copies, got epochs $eps")
      // n_copies column is constant and equals the copy count
      byDoc.get(id).foreach(g => assert(g.forall(_._3 == exp)))
    }
    // both branches exercised: at least one doc repeated, at least one dropped
    assert(got.count(_._4 == 1L) >= 1, "no doc reached epoch 1 — fixture broken")
    assert(rows.exists { case (id, _, src) => expectedCopies(id, src) == 0L },
      "no doc thinned away — fixture broken")
    // deterministic: a second run is identical
    val again = TextQueries.mixtureMaterialize(t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == again.toSeq)
  }

  // ---- fit-once LmModel (x39/x40) -----------------------------------------

  test("LmModel: gate output equals manual build+score; a loaded model scores a second batch identically") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val gate = TextQueries.bigramPerplexity(t).collect().map(_.toSeq).toSeq

    val docs = t.documents
    val m = TextQueries.buildLmModel(docs.filter(col("source") === "src0"))
    try {
      val manual = TextQueries
        .lmScore(m, docs.filter(col("source") =!= "src0"))
        .withColumn("ppl", round(exp(col("ce")), 6))
        .orderBy("doc_id")
        .collect().map(_.toSeq).toSeq
      assert(manual == gate)

      // round-trip: the loaded model scores bitwise-identically
      val dir = Files.createTempDirectory("lmmodel").toString
      TextQueries.saveLmModel(m, dir)
      val loaded = TextQueries.loadLmModel(spark, dir)
      try {
        val viaLoaded = TextQueries
          .lmScore(loaded, docs.filter(col("source") =!= "src0"))
          .withColumn("ppl", round(exp(col("ce")), 6))
          .orderBy("doc_id")
          .collect().map(_.toSeq).toSeq
        assert(viaLoaded == gate)
        // a second, different batch runs off the SAME model — no refit
        val batch2 = docs.filter(col("source") === "src1")
        val s2 = TextQueries.lmScore(loaded, batch2).collect()
        assert(s2.nonEmpty && s2.forall(r => r.getDouble(2) > 0.0))
      } finally loaded.release()
    } finally m.release()
  }

  // ---- fit-once DsirModel (x36) -------------------------------------------

  test("DsirModel: dsirScore over the gate's slices equals the x36 gate; unseen buckets score at lr0") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val gate = TextQueries.dsirWeights(t).collect().map(_.toSeq).toSeq

    val docs = t.documents
    val m = TextQueries.buildDsirModel(
      docs.filter(col("source") === "src0"),
      docs.filter(col("source") =!= "src0"))
    try {
      val manual = TextQueries
        .dsirScore(m, docs.filter(col("source") =!= "src0"))
        .orderBy("doc_id")
        .collect().map(_.toSeq).toSeq
      assert(manual == gate)

      // round-trip
      val dir = Files.createTempDirectory("dsirmodel").toString
      TextQueries.saveDsirModel(m, dir)
      val loaded = TextQueries.loadDsirModel(spark, dir)
      try {
        assert(loaded.lr0 == m.lr0)
        val viaLoaded = TextQueries
          .dsirScore(loaded, docs.filter(col("source") =!= "src0"))
          .orderBy("doc_id")
          .collect().map(_.toSeq).toSeq
        assert(viaLoaded == gate)
      } finally loaded.release()
    } finally m.release()
  }

  test("DsirModel: a batch hashing into buckets the fit never saw scores finite, using lr0") {
    // tiny planted fit: target and raw share a vocabulary; the scored
    // batch uses a disjoint vocabulary, so (almost surely) its bigram
    // buckets include unseen ones — scoring must stay finite and, for
    // a fully-unseen doc, equal n_bigrams * round(lr0, 6)-ish terms
    val fit = Tables(spark, docsDir(Seq(
      (0L, "a b a b a b", "tgt"), (1L, "c d c d c d", "raw"))))
    val m = TextQueries.buildDsirModel(
      fit.documents.filter(col("source") === "tgt"),
      fit.documents.filter(col("source") === "raw"))
    try {
      val batch = Tables(spark, docsDir(Seq(
        (10L, "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8", "new"))))
      val out = TextQueries.dsirScore(m, batch.documents).collect()
      assert(out.length == 1)
      val (n, w) = (out(0).getLong(1), out(0).getDouble(2))
      assert(n == 7L && !w.isNaN && !w.isInfinite)
      // every term is cnt=1 · lr(bucket); with all buckets unseen each
      // term is round(lr0, 6) — allow seen-bucket collisions a tolerance
      assert(math.abs(w - 7.0 * BigDecimal(m.lr0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1.0)
    } finally m.release()
  }

  // ---- classifier weight persistence (x45) --------------------------------

  test("QualityClassifier: a saved+loaded model scores bitwise-identically") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val m = QualityClassifier.train(t.documents, col("source") === "src0")
    val direct = QualityClassifier.score(t.documents, m)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val dir = Files.createTempDirectory("qcmodel").toString
    QualityClassifier.saveModel(m, spark, dir)
    val loaded = QualityClassifier.loadModel(spark, dir)
    assert(loaded.bias == m.bias && loaded.buckets == m.buckets)
    assert(loaded.weights.toSeq == m.weights.toSeq)
    val viaLoaded = QualityClassifier.score(t.documents, loaded)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaLoaded == direct)
  }

  // ---- x64 sequence packing -----------------------------------------------

  test("x64: spans equal an independent hand computation; sequences fill to seqLen; token totals conserve") {
    // token counts chosen to cross the 64-token boundary in every way:
    // exact fit (64), spans >2 sequences (150), boundary straddle (30,
    // 50), and a 1-token doc; doc 99 is empty (0 tokens -> excluded)
    val counts = Seq(0L -> 150, 1L -> 64, 2L -> 30, 3L -> 50, 4L -> 1,
      5L -> 70, 6L -> 40, 7L -> 25, 8L -> 100, 9L -> 63)
    val rows = counts.map { case (id, n) =>
      (id, (1 to n).map(i => s"w$i").mkString(" "), "src0")
    } :+ ((99L, "", "src0"))
    val t = Tables(spark, docsDir(rows))
    val got = TextQueries.sequencePack(t, seqLen = 64, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))

    // independent reimplementation: spec-local md5 hash60, Scala cumsum
    val keyed = counts.map { case (id, n) =>
      val shuf = hash60(s"pack_$id")
      (id, n.toLong, shuf, (shuf % 8).toInt)
    }
    val expected = keyed.groupBy(_._4).toSeq.flatMap { case (shard, ds) =>
      var cum = 0L
      ds.sortBy(d => (d._3, d._1)).flatMap { case (id, n, _, _) =>
        val start = cum; cum += n
        (start / 64 to (cum - 1) / 64).map { seq =>
          (id, shard, seq,
            math.min(seq * 64 + 64, cum) - math.max(seq * 64, start))
        }
      }
    }.sortBy(x => (x._2, x._3, x._1))
    assert(got.toSeq == expected)
    assert(!got.exists(_._1 == 99L), "0-token doc must not emit spans")
    // conservation: every doc's span tokens sum to its token count
    val perDoc = got.groupBy(_._1).map { case (id, ss) => id -> ss.map(_._4).sum }
    counts.foreach { case (id, n) => assert(perDoc(id) == n.toLong) }
    // every sequence except each shard's last holds exactly seqLen tokens
    val lastSeq = got.groupBy(_._2).map { case (sh, ss) => sh -> ss.map(_._3).max }
    got.groupBy(x => (x._2, x._3)).foreach { case ((sh, seq), ss) =>
      if (seq != lastSeq(sh)) assert(ss.map(_._4).sum == 64L,
        s"shard $sh seq $seq underfilled")
    }
  }
}
