package graft.operators

import graft.SparkSpec
import graft.core.Tables
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Specs for the round-8 additions x51 (semantic decontamination),
  * x52 (contrastive pair mining) and x53 (k-center coreset).
  * Each is checked against a driver-side brute-force reference on a
  * planted fixture — the same discipline as the other generated-or-
  * banded operators (the DuckDB gate then pins the full formulation
  * hash-exact at sf0.01). */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  /** embeddings fixture: `centers` well-separated axis clusters of
    * `per` points each (center + shrinking offsets), dim 8. */
  private def embDir(centers: Int, per: Int): String = {
    val dir = Files.createTempDirectory("r8emb").toString
    val rows = (0 until centers).flatMap { c =>
      (0 until per).map { p =>
        val v = Array.fill(8)(0.0f)
        v(c % 8) = 10.0f
        v((c + 3) % 8) = (p * 0.01f)  // small in-cluster spread
        ((c * per + p).toLong, v, c)
      }
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def load(dir: String): Array[(Long, Array[Double])] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
      .sortBy(_._1)

  private def d2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
    s
  }

  test("x53 k-center greedy matches the driver brute force and picks one point per planted cluster") {
    val dir = embDir(centers = 4, per = 5)
    val vecs = load(dir)
    // driver reference: same greedy, exact doubles
    val chosen = scala.collection.mutable.ArrayBuffer(
      (vecs.head._1, vecs.head._2, Option.empty[Double]))
    while (chosen.length < 4) {
      val ids = chosen.map(_._1).toSet
      val (id, v, rad) = vecs.filterNot(x => ids(x._1))
        .map { case (id, v) => (id, v, chosen.map(c => d2(v, c._2)).min) }
        .maxBy { case (id, _, m) => (m, -id.toDouble) } match {
          // maxBy on (m, -id): highest mind, then LOWEST id — mirror of
          // the engine's (mind DESC, vec_id ASC)
          case (id, v, m) => (id, v, Some(m))
        }
      chosen += ((id, v, rad))
    }
    val got = Similarity.kcenterCoreset(Tables(spark, dir), k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.map(_._2).toSeq == chosen.map(_._1).toSeq)
    // one pick per planted cluster (farthest-point jumps clusters first)
    assert(got.map(_._2 / 5).toSet.size == 4)
    // radius sequence monotone nonincreasing from step 1
    val radii = got.flatMap(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b })
    // radii match the reference to rounding
    chosen.toSeq.zip(got).foreach { case ((_, _, expect), (_, _, actual)) =>
      (expect, actual) match {
        case (Some(e), Some(a)) => assert(math.abs(e - a) < 1e-6)
        case (None, None)       =>
        case other              => fail(s"radius mismatch: $other")
      }
    }
  }

  test("x53 first center is the minimum vec_id and steps are 0..k-1") {
    val dir = embDir(centers = 3, per = 4)
    val got = Similarity.kcenterCoreset(Tables(spark, dir), k = 3).collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    assert(got.head.getLong(1) == 0L)
    assert(got.head.isNullAt(2))
    assert(got.map(_.getLong(1)).distinct.length == 3)
  }

  test("x51 semantic decontamination: argmax/flag match brute force, benchmark rows excluded") {
    val dir = embDir(centers = 4, per = 5)
    val vecs = load(dir).toMap
    // bench = vec 0 (cluster 0) and vec 10 (cluster 2): members of
    // those clusters are contaminated at cos~1, clusters 1/3 are clean
    val t = Tables(spark, dir)
    val got = Similarity.semDecontaminate(t, threshold = 0.5,
      benchMod = 10, benchRem = 0).collect()
    val benchIds = vecs.keys.filter(_ % 10 == 0).toSeq.sorted
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.zip(y).map { case (u, v) => u * v }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    assert(got.map(_.getLong(0)).toSet.intersect(benchIds.toSet).isEmpty)
    assert(got.length == vecs.size - benchIds.size)
    got.foreach { r =>
      val v = vecs(r.getLong(0))
      val scored = benchIds.map(b => (b, cos(v, vecs(b))))
      val best = scored.maxBy { case (b, c) => (c, -b.toDouble) }
      assert(r.getLong(1) == best._1,
        s"argmax bench for vec ${r.getLong(0)}")
      assert(math.abs(r.getDouble(2) - best._2) < 1e-6)
      assert(r.getBoolean(3) == (best._2 >= 0.5))
    }
    // in-cluster vectors see their cluster's benchmark member at cos~1
    assert(got.count(_.getBoolean(3)) > 0)
    assert(got.exists(!_.getBoolean(3)))
  }

  test("x51 plan: benchmark side broadcasts (no shuffle of the corpus)") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val plan = Similarity.semDecontaminate(t)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast NL join for the bench cross:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  /** documents fixture for x52: `twins` exact-duplicate pairs
    * (jac = 1, positives) + pairs sharing a minority of tokens
    * (lexical cousins — candidates under a 2-row band w.h.p. that
    * verify low) + unrelated singletons. */
  private def cpDir(): String = {
    val dir = Files.createTempDirectory("r8cp").toString
    val words = Seq("spark", "scan", "merge", "join", "agg", "sort",
      "hash", "key", "row", "batch", "table", "shard", "plan", "col")
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    var id = 0L
    // 6 twin pairs: identical 10-token docs
    (0 until 6).foreach { g =>
      val toks = (0 until 10).map(i => words((g * 5 + i * 3) % words.length))
      rows += ((id, toks.mkString(" "))); id += 1
      rows += ((id, toks.mkString(" "))); id += 1
    }
    // cousins: share a 10-token run (8 shared shingles), then 17
    // unique tokens each — jac = 8/(8+2*17) ~ 0.19, just under the
    // hard-negative cut; a 2-row band collides at ~jac^2 = 3.6%, so 20
    // pairs x 8 bands make >=1 mined hard negative near-certain (the
    // fixture hashes are fixed, so the outcome is deterministic)
    (0 until 20).foreach { g =>
      val shared = (0 until 10).map(i => words((g * 7 + i) % words.length) + s"g$g")
      val a = shared ++ (0 until 17).map(i => s"left${g}tok$i")
      val b = shared ++ (0 until 17).map(i => s"right${g}tok$i")
      rows += ((id, a.mkString(" "))); id += 1
      rows += ((id, b.mkString(" "))); id += 1
    }
    rows.toSeq.map { case (i, text) => (i, text, "en", "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("x52 contrastive pairs: twins surface as positives, cut thresholds respected, mid-band dropped") {
    val t = Tables(spark, cpDir())
    val got = TextQueries.contrastivePairs(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    // every planted twin pair (2g, 2g+1) for g<6 must be a positive at jac=1
    (0 until 6).foreach { g =>
      val hit = got.find(p => p._1 == 2L * g && p._2 == 2L * g + 1)
      assert(hit.isDefined, s"twin pair $g missing")
      assert(hit.get._3 == 1.0 && hit.get._4 == "positive")
    }
    // cut semantics: no mid-band rows, types match the jac side
    got.foreach { case (_, _, jac, tpe) =>
      assert(jac >= 0.5 || jac <= 0.2, s"mid-band pair leaked: $jac")
      assert(tpe == (if (jac >= 0.5) "positive" else "hard_negative"))
    }
    // the wide 8x2 banding must actually mine some hard negatives here
    assert(got.exists(_._4 == "hard_negative"),
      "no hard negatives mined from planted lexical cousins")
  }

  test("x54 leakage split: duplicate groups never straddle, assignment is content-pure") {
    val t = Tables(spark, cpDir())
    val got = TextQueries.leakageSplit(t, perMille = 300)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    // twins (2g, 2g+1), g<6, are exact dups: same fp, same split, size>=2
    (0 until 6).foreach { g =>
      val a = got.find(_._1 == 2L * g).get
      val b = got.find(_._1 == 2L * g + 1).get
      assert(a._2 == b._2 && a._4 == b._4 && a._3 >= 2)
    }
    // same-fp rows always share a split (the invariant, not just twins)
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._4).distinct.length == 1)
    }
    // both sides populated at a 30% cut over ~26 groups
    assert(got.exists(_._4 == "holdout") && got.exists(_._4 == "train"))
    // determinism: a second run over a REPARTITIONED view is identical
    val again = TextQueries.leakageSplit(t, perMille = 300)
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    got.foreach { case (id, _, _, s) => assert(again(id) == s) }
  }

  test("x54 cluster form: near-dup clusters share a split side") {
    val t = Tables(spark, cpDir())
    val got = TextQueries.leakageSplitByCluster(t, perMille = 300).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    got.groupBy(_._2).foreach { case (_, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster ${members.head._2} straddles the split")
    }
    // exact twins are ham=0 near-dups: same cluster by construction
    (0 until 6).foreach { g =>
      val a = got.find(_._1 == 2L * g).get
      val b = got.find(_._1 == 2L * g + 1).get
      assert(a._2 == b._2 && a._3 == b._3)
    }
  }

  test("x55 corpus report: integer margins consistent across rollup levels, dup incidence from twins") {
    val t = Tables(spark, cpDir())
    val rows = TextQueries.corpusReport(t).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    val leaf = rows.filter(_._3 == 0)
    val bySource = rows.filter(_._3 == 1)
    val total = rows.filter(_._3 == 3)
    assert(total.length == 1)
    // margins: every measure sums leaf -> source -> grand total
    def sums(rs: Array[(Option[String], Option[String], Long, Long, Long, Long, Long, Long)]) =
      (rs.map(_._4).sum, rs.map(_._5).sum, rs.map(_._6).sum,
        rs.map(_._7).sum, rs.map(_._8).sum)
    assert(sums(leaf) == sums(bySource) && sums(leaf) == sums(total))
    // fixture is all (s0, en): one leaf row, 52 docs, 12 twin-dup docs
    assert(leaf.length == 1 && leaf.head._1.contains("s0") &&
      leaf.head._2.contains("en"))
    assert(total.head._4 == 52 && total.head._8 == 12)
    // token mass cross-checked against a direct count
    val direct = t.documents
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .count()
    assert(total.head._5 == direct)
  }

  /** small two-side corpus for x56's exact path: even doc_ids = side
    * 0, odd = side 1; each doc one 5-token line (3 shingles), with a
    * planted shared doc across sides. */
  private def ovDir(): String = {
    val dir = Files.createTempDirectory("r8ov").toString
    val rows = Seq(
      (0L, "a b c d e"), (2L, "c d e f g"), (4L, "p q r s t"),
      (1L, "a b c d e"), (3L, "x y z w v"))
    rows.map { case (i, text) => (i, text, "en", "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("x56 overlap: sketches below k are exact — estimates equal true counts and Jaccard") {
    val t = Tables(spark, ovDir())
    val r = TextQueries.corpusOverlap(t, k = 64).collect()(0)
    // ground truth via direct shingle sets
    val sets = spark.read.parquet(s"${t.dir}/documents.parquet")
      .select((col("doc_id") % 2).as("side"),
        explode(graft.functions.TextFunctions.wordShingles(
          graft.functions.TextFunctions.tokens(col("text")), 3)).as("s"))
      .distinct().collect().map(x => (x.getLong(0), x.getString(1)))
    val sa = sets.filter(_._1 == 0).map(_._2).toSet
    val sb = sets.filter(_._1 == 1).map(_._2).toSet
    assert(r.getLong(1) == sa.size && r.getLong(2) == sb.size)
    assert(r.getDouble(3) == sa.size.toDouble)
    assert(r.getDouble(4) == sb.size.toDouble)
    assert(r.getDouble(5) == (sa ++ sb).size.toDouble)
    val truth = (sa & sb).size.toDouble / (sa ++ sb).size.toDouble
    // jac_est is ROUND(...,6): exact up to the emitted precision
    assert(math.abs(r.getDouble(6) - truth) < 5e-7)
  }

  test("x56 overlap: estimator path lands near truth on a real corpus") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val r = TextQueries.corpusOverlap(t, k = 64).collect()(0)
    val truthUnion = t.documents
      .select(explode(graft.functions.TextFunctions.wordShingles(
        graft.functions.TextFunctions.tokens(col("text")), 3)).as("s"))
      .distinct().count().toDouble
    // KMV relative error ~ 1/sqrt(k) = 12.5%; allow 3 sigma
    assert(r.getLong(1) == 64 && r.getLong(2) == 64) // both sketches full
    assert(math.abs(r.getDouble(5) - truthUnion) / truthUnion < 0.4,
      s"union est ${r.getDouble(5)} vs $truthUnion")
  }

  test("x57 consensus audit: twins are found by BOTH sketch families, labels match null pattern") {
    val t = Tables(spark, cpDir())
    val got = TextQueries.consensusNearDup(t).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getString(4)))).toMap
    (0 until 6).foreach { g =>
      val p = got.get((2L * g, 2L * g + 1))
      assert(p.isDefined, s"twin pair $g missing from the audit")
      val (jac, ham, by) = p.get
      assert(by == "both" && jac.contains(1.0) && ham.contains(0L), p)
    }
    got.values.foreach { case (jac, ham, by) =>
      by match {
        case "both"         => assert(jac.isDefined && ham.isDefined)
        case "minhash_only" => assert(jac.isDefined && ham.isEmpty)
        case "simhash_only" => assert(jac.isEmpty && ham.isDefined)
        case other          => fail(s"unknown label $other")
      }
      jac.foreach(j => assert(j >= 0.5))
      ham.foreach(h => assert(h <= 6))
    }
  }

  test("x57 collapsed audit equals the raw audit over the representative corpus") {
    // heavy bag duplicity: rotations share a token bag (same SimHash)
    val dir = Files.createTempDirectory("r8cons").toString
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val rows = (0 until 4).flatMap { d =>
      val toks = (0 until 8).map(i => words((d * 3 + i * 2) % words.length))
      (0 until 6).map { c =>
        val rot = toks.drop(c % toks.length) ++ toks.take(c % toks.length)
        ((d * 6 + c).toLong, rot.mkString(" "))
      }
    } ++ (0 until 5).map(i => ((24 + i).toLong, s"single unique doc number$i payload"))
    rows.map { case (id, tx) => (id, tx, "en", "s0", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t = Tables(spark, dir)
    val collapsed = TextQueries.consensusNearDupCollapsed(t).collect()
    // every rotated group collapses to its min doc_id with bag_dups=6
    val dups = collapsed.flatMap(r => Seq(r.getLong(0) -> r.getLong(5),
      r.getLong(1) -> r.getLong(6))).toMap
    dups.foreach { case (id, n) =>
      if (id < 24) { assert(id % 6 == 0, s"rep $id not group min"); assert(n == 6) }
      else assert(n == 1)
    }
    // equivalence: raw audit over the rep-only corpus gives the same rows
    val repIds = collapsed.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val repDir = Files.createTempDirectory("r8consrep").toString
    // reps = min doc per distinct simhash INCLUDING pairless ones; filter
    // from the simhash table directly to get the full rep universe
    val allReps = TextQueries.simhashDf(t.documents)
      .groupBy("sim").agg(org.apache.spark.sql.functions.min("doc_id").as("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(repIds.subsetOf(allReps))
    spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id").isInCollection(allReps))
      .write.mode("overwrite").parquet(s"$repDir/documents.parquet")
    val raw = TextQueries.consensusNearDup(Tables(spark, repDir)).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getString(4))).toSet
    val collapsedKeys = collapsed.map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getString(4))).toSet
    assert(collapsedKeys == raw)
  }

  test("x58 quality survivors: one keep per cluster, keep is the quality argmax, singletons keep themselves") {
    val t = Tables(spark, cpDir())
    val got = TextQueries.qualitySurvivors(t).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3)))
    assert(got.length == 52) // full corpus covered
    got.groupBy(_._2).foreach { case (cluster, members) =>
      assert(members.count(_._4) == 1, s"cluster $cluster keep count")
      val keeper = members.filter(_._4).head
      val best = members.maxBy { case (id, _, q, _) =>
        (q.getOrElse(Double.NegativeInfinity), -id.toDouble)
      }
      assert(keeper._1 == best._1, s"cluster $cluster kept ${keeper._1}, best $best")
      if (members.length == 1) assert(members.head._2 == members.head._1)
    }
    // twins are ham=0: always the same cluster (which may absorb more
    // members via SimHash chaining on this small-vocab fixture); at
    // most one of an identical pair can be kept, never both
    (0 until 6).foreach { g =>
      val pair = got.filter(p => p._1 == 2L * g || p._1 == 2L * g + 1)
      assert(pair.map(_._2).distinct.length == 1)
      assert(pair.count(_._4) <= 1)
    }
  }

  test("x52 output is a filtered subset of the wide-band lshPairs") {
    val t = Tables(spark, cpDir())
    val wide = TextQueries.lshPairs(t, bandRows = 2, numBands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = TextQueries.contrastivePairs(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got.foreach(p => assert(wide(p), s"pair $p not in wide-band candidates"))
  }
}
