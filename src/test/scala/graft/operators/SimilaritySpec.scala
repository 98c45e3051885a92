package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(2.0f, 0.0f, 0.0f)),
    (3L, Array(1.0f, 1.0f, 0.0f)),
  ).toDF("vec_id", "a").withColumn("b", col("a"))

  test("cosine of a vector with itself is 1") {
    val r = vecs.select(Similarity.cosine("a", "b").as("c"))
      .collect().map(_.getDouble(0))
    r.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
  }

  test("cosine of orthogonal vectors is 0, scaled copies 1") {
    val two = vecs.as("x").join(vecs.as("y"),
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("i"), col("y.vec_id").as("j"),
        Similarity.cosine("x.a", "y.a").as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(two((0L, 1L))) < 1e-12)        // orthogonal
    assert(math.abs(two((0L, 2L)) - 1.0) < 1e-12)  // same direction
    assert(math.abs(two((0L, 3L)) - math.sqrt(0.5)) < 1e-12)
  }

  test("banded near-dup blocking: full recall on planted pairs, near-linear candidate growth at 10x") {
    // n/2 planted near-dup pairs (base gaussian + 1e-3 noise): every
    // pair must collide in >=1 of the 4 16-bit bands, while unrelated
    // pairs (cos ~ 0) collide with probability ~4/2^16 — so candidate
    // count tracks the number of TRUE near-dups (linear), not n^2.
    val rnd = new scala.util.Random(11)
    def corpus(n: Int) = (0 until n / 2).flatMap { g =>
      val v = Array.fill(64)(rnd.nextGaussian().toFloat)
      val w = v.map(x => x + (rnd.nextGaussian() * 1e-3).toFloat)
      Seq((2L * g, v), (2L * g + 1, w))
    }.toDF("vec_id", "embedding")
    val small = corpus(100).persist()
    val big = corpus(1000).persist()
    val cSmall = Similarity.bandedCandidates(small).count()
    val cBig = Similarity.bandedCandidates(big).count()
    assert(cSmall >= 45, s"recall lost: only $cSmall of 50 planted pairs collide")
    assert(cBig >= 450, s"recall lost at 10x: $cBig of 500")
    // quadratic blocking would grow 100x (the old single 8-bit sketch
    // put every vector into one of 256 buckets); require ~linear
    assert(cBig.toDouble / cSmall < 30,
      s"candidate growth ${cBig.toDouble / cSmall}x for 10x data (small=$cSmall big=$cBig)")
    small.unpersist(); big.unpersist()
  }

  test("bruteForceTopK over sf0.001: 10 queries x k ranked results") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val rows = Similarity.bruteForceTopK(t, nQueries = 3, k = 5).collect()
    assert(rows.length == 15)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rk")).sorted.sameElements(1L to 5L))
      val cs = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, "cos non-increasing in rank")
    }
  }

  test("build-once IVF index answers identically to the per-call ivfTopK") {
    import org.apache.spark.sql.functions.col
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val direct = Similarity.ivfTopK(t, nQueries = 5, k = 5, nprobe = 4)
      .collect().map(_.toSeq).toSeq
    val index = Similarity.buildIvfIndex(t)
    try {
      val queryDf = t.embeddings.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val viaIndex = Similarity.ivfQuery(index, queryDf, k = 5, nprobe = 4)
        .collect().map(_.toSeq).toSeq
      assert(viaIndex == direct)
      // a second, different batch runs off the SAME index
      val q2 = t.embeddings.filter(col("vec_id") >= 5 && col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val out2 = Similarity.ivfQuery(index, q2, k = 3, nprobe = 4).collect()
      assert(out2.length == 9 &&
        out2.map(_.getLong(0)).toSet == Set(5L, 6L, 7L))
    } finally index.release()
  }

  test("build-once PQ index answers identically to per-call x61/x62; a second batch reuses it") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    // gate forms build their own (released) index per call; they are
    // the RAW-coding x60 lineage, so the parity index is built with
    // residual = false explicitly (the build-once default is residual
    // since r13 — pinned in its own test below)
    val adcDirect = Similarity.ivfPqTopK(t).collect().map(_.toSeq).toSeq
    val rrDirect = Similarity.ivfPqRerankTopK(t).collect().map(_.toSeq).toSeq
    val index = Similarity.buildPqIndex(t, residual = false)
    try {
      // index shape: one narrow row per vector, the 8 subspace codes
      // nibble-packed into one int, every nibble in [0, PqKsub)
      assert(index.codes.columns.toSeq ==
        Seq("vec_id", "cell", "packed", "rn2"))
      assert(index.codes.schema("packed").dataType ==
        org.apache.spark.sql.types.IntegerType)
      val codeRows = index.codes.select("packed").collect()
      assert(codeRows.nonEmpty)
      codeRows.foreach { r =>
        val packed = r.getInt(0)
        val cs = (0 until 8).map(i => (packed >>> (i * 4)) & 0xF)
        assert(cs.forall(c => c >= 0 && c < 16))
      }
      // the packed nibbles are real codes, not degenerate zeros
      assert(codeRows.map(_.getInt(0)).distinct.length > 1)
      val q = t.embeddings.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val viaIdx = Similarity.pqQuery(index, q)
        .collect().map(_.toSeq).toSeq
      assert(viaIdx == adcDirect)
      val viaIdxRr = Similarity.pqQuery(index, q, rerankShortlist = 50)
        .collect().map(_.toSeq).toSeq
      assert(viaIdxRr == rrDirect)
      // a second, different batch runs off the SAME persisted index
      val q2 = t.embeddings.filter(col("vec_id") >= 10 && col("vec_id") < 13)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val out2 = Similarity.pqQuery(index, q2, k = 3).collect()
      assert(out2.length == 9 &&
        out2.map(_.getLong(0)).toSet == Set(10L, 11L, 12L))
    } finally index.release()
  }

  test("IVF index round-trips through parquet: loaded index answers identically") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val built = Similarity.buildIvfIndex(t)
    try {
      val q = t.embeddings.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val ansBuilt = Similarity.ivfQuery(built, q, k = 5, nprobe = 4)
        .collect().map(_.toSeq).toSeq
      Similarity.saveIvfIndex(built, dir)
      val loaded = Similarity.loadIvfIndex(spark, dir)
      try {
        assert(loaded.centroids.map(_.toSeq).toSeq ==
          built.centroids.map(_.toSeq).toSeq)
        assert(Similarity.ivfQuery(loaded, q, k = 5, nprobe = 4)
          .collect().map(_.toSeq).toSeq == ansBuilt)
      } finally loaded.release()
    } finally built.release()
  }

  test("PQ index round-trips through parquet: loaded index answers identically, rerank included") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    val built = Similarity.buildPqIndex(t)
    try {
      val q = t.embeddings.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val adcBuilt = Similarity.pqQuery(built, q).collect().map(_.toSeq).toSeq
      val rrBuilt = Similarity.pqQuery(built, q, rerankShortlist = 50)
        .collect().map(_.toSeq).toSeq
      Similarity.savePqIndex(built, dir)
      // the artifact elides the derived rn2 (it re-derives on load)
      assert(spark.read.parquet(s"$dir/codes").columns.toSeq ==
        Seq("vec_id", "cell", "packed"))
      val loaded = Similarity.loadPqIndex(spark, dir,
        t.embeddings.select(col("vec_id"), col("embedding")))
      try {
        assert(loaded.centroids.map(_.toSeq).toSeq ==
          built.centroids.map(_.toSeq).toSeq)
        assert(loaded.books.map(_.map(_.toSeq).toSeq).toSeq ==
          built.books.map(_.map(_.toSeq).toSeq).toSeq)
        assert(Similarity.pqQuery(loaded, q).collect().map(_.toSeq).toSeq
          == adcBuilt)
        assert(Similarity.pqQuery(loaded, q, rerankShortlist = 50)
          .collect().map(_.toSeq).toSeq == rrBuilt)
      } finally loaded.release()
    } finally built.release()
  }

  test("absorbDelta(IvfIndex): frozen-state assignment, old rows untouched, chunked == one-shot") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val emb = t.embeddings.select(col("vec_id"), col("embedding"))
    val base = emb.filter(col("vec_id") % 3 =!= 0)
    val delta = emb.filter(col("vec_id") % 3 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val idx = Similarity.buildIvfIndexFrom(base, tag = "absorb-base")
    try {
      val one = Similarity.absorbDelta(idx, delta)
      try {
        // old rows bit-identical, centroids untouched, count = old + delta
        val oldRows = idx.assigned.collect().map(_.toSeq).toSet
        val absorbed = one.assigned.collect().map(_.toSeq).toSet
        assert(oldRows.subsetOf(absorbed))
        assert(absorbed.size == oldRows.size + delta.count())
        assert(one.centroids eq idx.centroids)
        // a query equal to an absorbed vector finds it at exact cos 1
        val dRow = delta.orderBy("vec_id").limit(1).collect()(0)
        val q = Seq((dRow.getLong(0), dRow.getSeq[Float](1).toArray))
          .toDF("qid", "qe")
        val hits = Similarity.ivfQuery(one, q, k = 3, nprobe = 4).collect()
        assert(hits.nonEmpty)
        // self is excluded by vec_id; plant a distinct query id instead
        val q2 = Seq((-1L, dRow.getSeq[Float](1).toArray)).toDF("qid", "qe")
        val top = Similarity.ivfQuery(one, q2, k = 1, nprobe = 4).collect()(0)
        assert(top.getLong(1) == dRow.getLong(0) &&
          top.getDouble(2) == 1.0)
        // absorbing in two chunks lands on the same table
        val d1 = delta.filter(col("vec_id") % 2 === 0)
        val d2 = delta.filter(col("vec_id") % 2 =!= 0)
        val twoA = Similarity.absorbDelta(idx, d1)
        val two = Similarity.absorbDelta(twoA, d2)
        try assert(two.assigned.collect().map(_.toSeq).toSet == absorbed)
        finally { two.release(); twoA.release() }
      } finally one.release()
    } finally idx.release()
  }

  test("absorbDelta(PqIndex): frozen books+centroids encode, rerank finds absorbed vectors, empty refused") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val emb = t.embeddings.select(col("vec_id"), col("embedding"))
    val base = emb.filter(col("vec_id") % 3 =!= 0)
    val delta = emb.filter(col("vec_id") % 3 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val idx = Similarity.buildPqIndexFrom(base, tag = "absorb-base-pq")
    try {
      val one = Similarity.absorbDelta(idx, delta)
      try {
        val oldRows = idx.codes.collect().map(_.toSeq).toSet
        val absorbed = one.codes.collect().map(_.toSeq).toSet
        assert(oldRows.subsetOf(absorbed))
        assert(absorbed.size == oldRows.size + delta.count())
        assert((one.books eq idx.books) && (one.centroids eq idx.centroids))
        // exact re-rank over the grown raw frame finds the absorbed
        // vector at cosine 1 for an identical query
        val dRow = delta.orderBy("vec_id").limit(1).collect()(0)
        val q = Seq((-1L, dRow.getSeq[Float](1).toArray)).toDF("qid", "qe")
        val top = Similarity.pqQuery(one, q, k = 1, nprobe = 4,
          rerankShortlist = 50).collect()(0)
        assert(top.getLong(1) == dRow.getLong(0) && top.getDouble(2) == 1.0)
        // chunked == one-shot
        val d1 = delta.filter(col("vec_id") % 2 === 0)
        val d2 = delta.filter(col("vec_id") % 2 =!= 0)
        val twoA = Similarity.absorbDelta(idx, d1)
        val two = Similarity.absorbDelta(twoA, d2)
        try assert(two.codes.collect().map(_.toSeq).toSet == absorbed)
        finally { two.release(); twoA.release() }
      } finally one.release()
    } finally idx.release()
    val emptyIdx = Similarity.buildPqIndexFrom(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"))
    val ex = intercept[IllegalArgumentException](
      Similarity.absorbDelta(emptyIdx, delta))
    assert(ex.getMessage.contains("empty PqIndex"))
  }

  test("appendPqDelta: committed batches load, partial batches are invisible, replays never duplicate") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val emb = t.embeddings.select(col("vec_id"), col("embedding"))
    val base = emb.filter(col("vec_id") % 3 =!= 0)
    val delta = emb.filter(col("vec_id") % 3 === 0)
      .select((col("vec_id") + 3000000L).as("vec_id"), col("embedding"))
    val grownRaw = base.unionByName(delta)
    val dir = java.nio.file.Files.createTempDirectory("pqatomic").toString
    val built = Similarity.buildPqIndexFrom(base, tag = "atomic-base")
    try {
      Similarity.savePqIndex(built, dir)
      val baseCount = built.codes.count()
      val one = Similarity.appendPqDelta(spark, dir, delta, grownRaw, "b1")
      val grown = one.codes.count()
      assert(grown == baseCount + delta.count())
      one.release()
      // replaying the SAME batch id is a no-op, not a duplication —
      // the old mode("append") silently doubled every delta row here
      val replay = Similarity.appendPqDelta(spark, dir, delta, grownRaw, "b1")
      try assert(replay.codes.count() == grown)
      finally replay.release()
      // a batch dir without the commit marker (writer died mid-append)
      // is never served
      val partial = new java.io.File(s"$dir/deltas/dead")
      assert(partial.mkdirs())
      val stray = built.codes.sparkSession // reuse session
      Similarity.savePqIndex(built, s"$dir-scratch")
      val strayPart = new java.io.File(s"$dir-scratch/codes").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(strayPart.toPath,
        new java.io.File(partial, strayPart.getName).toPath)
      val afterPartial = Similarity.loadPqIndex(stray, dir, grownRaw)
      try assert(afterPartial.codes.count() == grown)
      finally afterPartial.release()
      // a fresh savePqIndex at the same path clears committed deltas —
      // they were encoded against the OLD trained state
      Similarity.savePqIndex(built, dir)
      val fresh = Similarity.loadPqIndex(spark, dir, base)
      try assert(fresh.codes.count() == baseCount)
      finally fresh.release()
    } finally built.release()
  }

  test("loadPqIndex refuses a versionless (v1) artifact with an explicit rebuild message") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("pqv1").toString
    val built = Similarity.buildPqIndex(t)
    try {
      Similarity.savePqIndex(built, dir)
      // strip the version column — the shape of a pre-r11 artifact
      val old = spark.read.parquet(s"$dir/model").drop("format_version")
      old.write.mode("overwrite").parquet(s"$dir/model2")
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/model"), true)
      fs.rename(new org.apache.hadoop.fs.Path(s"$dir/model2"),
        new org.apache.hadoop.fs.Path(s"$dir/model"))
      val ex = intercept[IllegalStateException] {
        Similarity.loadPqIndex(spark, dir,
          t.embeddings.select(col("vec_id"), col("embedding")))
      }
      assert(ex.getMessage.contains("format v1") &&
        ex.getMessage.contains("rebuild with savePqIndex"))
    } finally built.release()
  }

  test("saveRerankRaw: rerank answers unchanged; fetch prunes to the probed cells' partitions") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("pqrrraw").toString
    val built = Similarity.buildPqIndex(t)
    try {
      val q = t.embeddings.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val want = Similarity.pqQuery(built, q, rerankShortlist = 50)
        .collect().map(_.toSeq).toSeq
      Similarity.savePqIndex(built, dir)
      Similarity.saveRerankRaw(built, dir)
      // one directory per coarse cell on disk
      val cellDirs = new java.io.File(s"$dir/raw").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell=")).length
      assert(cellDirs > 4, s"expected a multi-cell layout, got $cellDirs dirs")
      val loaded = Similarity.loadPqIndexWithRaw(spark, dir)
      try {
        assert(loaded.raw.columns.contains("cell"))
        val res = Similarity.pqQuery(loaded, q, rerankShortlist = 50)
        assert(res.collect().map(_.toSeq).toSeq == want)
        // plan pin: the raw fetch's scan carries the probed-cell IN-list
        // as a PartitionFilter and reads fewer files than the layout holds
        // AQE wraps the tree; descend into the adaptive final plan
        def rawScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
          p.collect {
            case s: org.apache.spark.sql.execution.FileSourceScanExec
              if s.relation.location.rootPaths.exists(_.toString.contains("raw"))
            => Seq(s)
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              rawScans(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              rawScans(q.plan)
          }.flatten
        val scans = rawScans(res.queryExecution.executedPlan)
        assert(scans.nonEmpty, "raw fetch should be a parquet file scan")
        val scan = scans.head
        assert(scan.partitionFilters.map(_.sql).mkString(" ")
          .toLowerCase.contains("cell"),
          s"probed-cell predicate missing from PartitionFilters: ${scan.partitionFilters}")
        assert(scan.metrics("numFiles").value < cellDirs,
          s"fetch read ${scan.metrics("numFiles").value} files of $cellDirs cell dirs — no pruning")
        // pushed vec_id predicates reach the data filters too
        assert(scan.dataFilters.map(_.sql).mkString(" ")
          .toLowerCase.contains("vec_id"))
      } finally loaded.release()
    } finally built.release()
  }

  test("appendPqDelta: artifact grows by the delta only; reloaded answers == in-memory absorb") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val emb = t.embeddings.select(col("vec_id"), col("embedding"))
    val base = emb.filter(col("vec_id") % 3 =!= 0)
    val delta = emb.filter(col("vec_id") % 3 === 0)
      .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))
    val grownRaw = base.unionByName(delta)
    val dir = java.nio.file.Files.createTempDirectory("pqappend").toString
    val built = Similarity.buildPqIndexFrom(base, tag = "append-base")
    try {
      Similarity.savePqIndex(built, dir)
      val absorbed = Similarity.absorbDelta(built, delta)
      try {
        val appended = Similarity.appendPqDelta(spark, dir, delta, grownRaw, "grow1")
        try {
          assert(appended.codes.count() == absorbed.codes.count())
          assert(appended.codes.collect().map(_.toSeq).toSet ==
            absorbed.codes.collect().map(_.toSeq).toSet)
          val q = delta.orderBy("vec_id").limit(1).collect()(0)
          val qd = Seq((-1L, q.getSeq[Float](1).toArray)).toDF("qid", "qe")
          val a = Similarity.pqQuery(absorbed, qd, k = 5, nprobe = 4,
            rerankShortlist = 50).collect().map(_.toSeq).toSeq
          val b = Similarity.pqQuery(appended, qd, k = 5, nprobe = 4,
            rerankShortlist = 50).collect().map(_.toSeq).toSeq
          assert(a == b)
        } finally appended.release()
      } finally absorbed.release()
    } finally built.release()
  }

  test("PQ index over an empty corpus: empty results with the declared schemas, no crash") {
    val emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val index = Similarity.buildPqIndexFrom(emptyEmb)
    assert(index.isEmpty)
    val q = Seq((0L, Array(1.0f, 0.0f))).toDF("qid", "qe")
    val adc = Similarity.pqQuery(index, q)
    assert(adc.columns.toSeq == Seq("qid", "vec_id", "cos_pq", "rk"))
    assert(adc.count() == 0)
    val rr = Similarity.pqQuery(index, q, rerankShortlist = 50)
    assert(rr.columns.toSeq == Seq("qid", "vec_id", "cos", "rk"))
    assert(rr.count() == 0)
  }

  test("pqQuery with an EMPTY query batch: empty result, declared schema, no job explosion") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val index = Similarity.buildPqIndex(t)
    try {
      val noQ = Seq.empty[(Long, Array[Float])].toDF("qid", "qe")
      val adc = Similarity.pqQuery(index, noQ)
      assert(adc.columns.toSeq == Seq("qid", "vec_id", "cos_pq", "rk"))
      assert(adc.count() == 0)
      val rr = Similarity.pqQuery(index, noQ, rerankShortlist = 50)
      assert(rr.columns.toSeq == Seq("qid", "vec_id", "cos", "rk"))
      assert(rr.count() == 0)
    } finally index.release()
  }

  test("residual PQ (IVFADC): recovers within-cluster ranking raw coding loses; round-trips and absorbs") {
    // Clustered fixture with RETRIEVAL margin structure: 8 tight
    // clusters of 64-d vectors, plus 10 planted true neighbors per
    // query at a tiny perturbation. Raw-vector codebooks spend their
    // 16 codewords/subspace describing which cluster (the cell id
    // already knows) and tie the whole cluster at one ADC score;
    // residual codebooks describe within-cell offsets and rank the
    // planted neighbors first — the faiss IVFADC rationale.
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextDouble() * 6 - 3))
    def point(c: Int, sigma: Double): Array[Float] =
      centers(c).map(x => (x + (rnd.nextDouble() * 2 - 1) * sigma).toFloat)
    val background = (0 until 4000).map(i => (i.toLong, point(i % 8, 0.3)))
    val queries10 = background.take(10)
    val planted = queries10.flatMap { case (qid, qv) =>
      (0 until 10).map(j => (9000000L + qid * 10 + j,
        qv.map(x => (x + (rnd.nextDouble() * 2 - 1) * 0.01f).toFloat)))
    }
    val all = background ++ planted
    val emb = all.toDF("vec_id", "embedding")
    val qdf = queries10.toDF("qid", "qe")
    // exact top-10 (driver-side; the corpus is 4,100 rows)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exactTop = queries10.map { case (qid, qv) =>
      qid -> all.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    }.toMap
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double = {
      val got = rows.groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      exactTop.map { case (q, ex) =>
        got.getOrElse(q, Set.empty[Long]).intersect(ex).size / 10.0 }
        .sum / exactTop.size
    }
    val raw = Similarity.buildPqIndexFrom(emb, nlist = 8, maxTrain = 2000,
      tag = "resid-raw", residual = false)
    val res = Similarity.buildPqIndexFrom(emb, nlist = 8, maxTrain = 2000,
      tag = "resid-res", residual = true)
    try {
      val rawRecall = recallOf(
        Similarity.pqQuery(raw, qdf, k = 10, nprobe = 4).collect())
      val resRecall = recallOf(
        Similarity.pqQuery(res, qdf, k = 10, nprobe = 4).collect())
      info(s"ADC recall@10: raw=$rawRecall residual=$resRecall")
      assert(resRecall > rawRecall + 0.2,
        s"residual coding should clearly beat raw on clustered data: raw=$rawRecall res=$resRecall")
      assert(resRecall >= 0.7, s"residual ADC recall too low: $resRecall")
      // round trip: loaded residual index answers identically (ADC and
      // re-rank), flag preserved
      val dir = java.nio.file.Files.createTempDirectory("pqresid").toString
      Similarity.savePqIndex(res, dir)
      val loaded = Similarity.loadPqIndex(spark, dir,
        emb.select(col("vec_id"), col("embedding")))
      try {
        assert(loaded.residual)
        assert(Similarity.pqQuery(loaded, qdf, k = 10, nprobe = 4)
          .collect().map(_.toSeq).toSeq ==
          Similarity.pqQuery(res, qdf, k = 10, nprobe = 4)
            .collect().map(_.toSeq).toSeq)
      } finally loaded.release()
      // absorb: frozen-state residual encode; an identical-vector query
      // finds the absorbed vector at exact cosine 1 through re-rank
      val dv = point(3, 0.3)
      val delta = Seq((7777777L, dv)).toDF("vec_id", "embedding")
      val grown = Similarity.absorbDelta(res, delta)
      try {
        assert(grown.codes.count() == res.codes.count() + 1)
        val top = Similarity.pqQuery(grown,
          Seq((-1L, dv)).toDF("qid", "qe"), k = 1, nprobe = 4,
          rerankShortlist = 50).collect()(0)
        assert(top.getLong(1) == 7777777L && top.getDouble(2) == 1.0)
        // appended artifact equals in-memory absorb
        val appended = Similarity.appendPqDelta(spark, dir, delta,
          emb.unionByName(delta), "rb1")
        try assert(appended.codes.collect().map(_.toSeq).toSet ==
          grown.codes.collect().map(_.toSeq).toSet)
        finally appended.release()
      } finally grown.release()
    } finally { raw.release(); res.release() }
  }

  test("build-once default is RESIDUAL coding; raw stays the explicit gated lineage; x66 == build+rerank-query") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    // r13 contract (VERDICT r12 item 5): raw PQ measured recall@10 =
    // 0.00 on clustered corpora, so the build-once API defaults to the
    // residual (IVFADC) form a production caller should get
    val dflt = Similarity.buildPqIndex(t)
    try {
      assert(dflt.residual, "buildPqIndex default must be residual since r13")
      assert(!Similarity.buildPqIndex(t, residual = false).residual)
      // the x66 gate form is exactly build(residual) + one rerank query
      val q = t.embeddings.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val viaIdx = Similarity.pqQuery(dflt, q, rerankShortlist = 50)
        .collect().map(_.toSeq).toSeq
      val gate = Similarity.residualPqRerankTopK(t)
        .collect().map(_.toSeq).toSeq
      assert(viaIdx == gate)
      assert(gate.nonEmpty)
    } finally dflt.release()
  }

  test("appendPqDelta extends a saveRerankRaw layout by the delta only; partial raw batches invisible; re-layout compacts") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val emb = t.embeddings.select(col("vec_id"), col("embedding"))
    val base = emb.filter(col("vec_id") % 3 =!= 0)
    val delta = emb.filter(col("vec_id") % 3 === 0)
      .select((col("vec_id") + 3000000L).as("vec_id"), col("embedding"))
    val grownRaw = base.unionByName(delta)
    val dir = java.nio.file.Files.createTempDirectory("pqrawgrow").toString
    def parquetFiles(root: String): Seq[(String, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(root)).filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath, f.lastModified())).sortBy(_._1)
    }
    val built = Similarity.buildPqIndexFrom(base, tag = "rawgrow-base")
    try {
      Similarity.savePqIndex(built, dir)
      Similarity.saveRerankRaw(built, dir)
      val baseFiles = parquetFiles(s"$dir/raw")
      val appended = Similarity.appendPqDelta(spark, dir, delta, grownRaw, "g1")
      appended.release() // we reload via the artifact's own raw below
      // the base snapshot was NOT rewritten; the growth is a committed
      // cell-partitioned rawdeltas batch
      assert(parquetFiles(s"$dir/raw") == baseFiles,
        "base raw layout must not be rewritten by an append")
      assert(new java.io.File(s"$dir/rawdeltas/g1/_GRAFT_COMMITTED").exists())
      assert(new java.io.File(s"$dir/rawdeltas/g1").listFiles()
        .exists(f => f.isDirectory && f.getName.startsWith("cell=")),
        "raw delta batch must be cell-partitioned for probe pruning")
      val loaded = Similarity.loadPqIndexWithRaw(spark, dir)
      try {
        assert(loaded.raw.columns.contains("cell"))
        assert(loaded.raw.count() == grownRaw.count())
        // a delta vector is findable through the PRUNED exact re-rank
        val dq = delta.orderBy("vec_id").limit(1).collect()(0)
        val top = Similarity.pqQuery(loaded,
          Seq((-1L, dq.getSeq[Float](1).toArray)).toDF("qid", "qe"),
          k = 1, nprobe = 4, rerankShortlist = 50).collect()(0)
        assert(top.getLong(1) == dq.getLong(0) && top.getDouble(2) == 1.0)
      } finally loaded.release()
      // a partial (uncommitted) raw batch is invisible to the union
      val partial = delta.limit(5)
        .join(spark.read.parquet(s"$dir/deltas/g1")
          .select(col("vec_id"), col("cell")), "vec_id")
      partial.write.partitionBy("cell").mode("overwrite")
        .parquet(s"$dir/rawdeltas/gPARTIAL")
      val loaded2 = Similarity.loadPqIndexWithRaw(spark, dir)
      try assert(loaded2.raw.count() == grownRaw.count(),
        "uncommitted rawdeltas batch must be invisible")
      finally loaded2.release()
      // re-running saveRerankRaw over the grown index compacts: fresh
      // base snapshot, rawdeltas cleared (committed and partial alike)
      val grownIdx = Similarity.loadPqIndexWithRaw(spark, dir)
      Similarity.saveRerankRaw(grownIdx, dir)
      grownIdx.release()
      assert(!new java.io.File(s"$dir/rawdeltas").exists())
      val loaded3 = Similarity.loadPqIndexWithRaw(spark, dir)
      try assert(loaded3.raw.count() == grownRaw.count())
      finally loaded3.release()
    } finally built.release()
  }
}
