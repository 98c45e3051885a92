package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Two tight 15-cell blobs in 5-D PC space, far apart. */
  private lazy val emb = {
    val blobA = (0 until 15).map(i =>
      (i.toLong, Array(0.0 + 0.1 * (i % 5), 0.1 * (i % 3), 0.0, 0.0, 0.0)))
    val blobB = (0 until 15).map(i =>
      (100L + i, Array(50.0 + 0.1 * (i % 5), 50.0 + 0.1 * (i % 3), 0.0, 0.0, 0.0)))
    (blobA ++ blobB).toDF("cells_id", "pc")
      .persist()
  }

  test("kNN neighbors stay within the blob") {
    val knn = Snn.knn(emb, k = 5)
    val cross = knn.filter(
      (col("cid") < 100 && col("nid") >= 100) ||
        (col("cid") >= 100 && col("nid") < 100)).count()
    assert(cross == 0)
    val perCell = knn.groupBy("cid").count().collect().map(_.getLong(1))
    assert(perCell.forall(_ == 5))
  }

  test("LSH candidate-pair count stays O(n·k) under a 10x blowup") {
    // Uniform cloud in 5-D: with an unbounded radius every bucket
    // collision survives, so candidates grow ~quadratically with n.
    // The data-derived finite radius must keep growth ~linear.
    val rnd = new scala.util.Random(7)
    def cloud(n: Int) = (0 until n).map(i =>
      (i.toLong, Array.fill(5)(rnd.nextDouble() * 100))).toDF("cells_id", "pc")
    val k = 10
    val small = cloud(300).persist()
    val big = cloud(3000).persist()
    val cSmall = Snn.candidatePairs(small, small, k, seed = 42L).count()
    val cBig = Snn.candidatePairs(big, big, k, seed = 42L).count()
    // quadratic would be 100x; require comfortably sub-quadratic and
    // within a constant factor of the linear ideal (10x)
    assert(cBig.toDouble / cSmall < 30,
      s"candidate growth ${cBig.toDouble / cSmall}x for 10x data (small=$cSmall big=$cBig)")
    // and the bounded join still yields full, correct k-neighborhoods
    val perCell = Snn.knnJoin(big, big, k, seed = 42L)
      .groupBy("cid").count().collect().map(_.getLong(1))
    assert(perCell.length == 3000 && perCell.forall(_ == k))
    small.unpersist(); big.unpersist()
  }

  test("coincident-heavy data keeps a finite radius and a bounded candidate set") {
    // >= k exact duplicates per point (PCR duplicates / zero-expression
    // cells collapsing in PCA): the sampled kth-NN distance is 0, and
    // the radius estimator must degrade to a SMALL positive radius —
    // the old MaxValue degradation flipped the join quadratic (the
    // domain soak spilled >78 GB of candidate pairs on exactly this
    // shape before the fix).
    val k = 10
    val piles = (0 until 40).flatMap { p =>
      (0 until 50).map { c => // 50 identical copies of each of 40 points
        ((p * 50 + c).toLong,
          Array(10.0 * p, 3.0 * (p % 7), 0.0, 0.0, 0.0))
      }
    }.toDF("cells_id", "pc").persist()
    val r = Snn.estimateRadius(piles, piles, k, seed = 42L)
    assert(r > 0 && r < Double.MaxValue, s"radius degraded to $r")
    // candidates = the true radius-bounded pair set: 49 own-pile
    // neighbors plus the 2-4 adjacent piles that fall inside the
    // fallback radius (2x the nearest inter-pile distance) — about
    // n x 220 here, nowhere near the n^2 = 4M cartesian the MaxValue
    // degradation used to produce
    val cands = Snn.candidatePairs(piles, piles, k, seed = 42L).count()
    assert(cands < 600000L, s"candidate blowup: $cands pairs for 2000 points")
    // and every cell still gets its k coincident neighbors
    val perCell = Snn.knnJoin(piles, piles, k, seed = 42L)
      .groupBy("cid").count().collect().map(_.getLong(1))
    assert(perCell.length == 2000 && perCell.forall(_ == k))
    piles.unpersist()
  }

  test("radius tracks true density past the probe panel — no sample-rate inflation") {
    // Two uniform clouds at the SAME density, one 4x the volume/points
    // of the other (both past the old 2048-point corpus-sample cap).
    // The kth-NN distance depends only on density, so the estimated
    // radius must match across them. The former sample-based estimator
    // measured the big corpus through a 2048/12000 sample — an
    // effective density ~5.9x too low, inflating its radius ~(5.9)^(1/3)
    // ≈ 1.8x and with it the grid candidate volume superlinearly (the
    // 1M-barcode domain soak measured 2.5x cells → 10x doublets
    // shuffle from exactly this).
    val rnd = new scala.util.Random(11)
    def cube(n: Int, side: Double) = (0 until n).map(i =>
      (i.toLong, Array.fill(3)(rnd.nextDouble() * side))).toDF("cells_id", "pc")
    val k = 10
    val small = cube(3000, 100.0).persist()             // density 3e-3
    val big = cube(12000, 100.0 * math.cbrt(4.0)).persist() // same density
    val rSmall = Snn.estimateRadius(small, small, k, seed = 42L)
    val rBig = Snn.estimateRadius(big, big, k, seed = 42L)
    assert(rBig < rSmall * 1.35 && rBig > rSmall * 0.65,
      s"radius not density-stable: small=$rSmall big=$rBig")
    small.unpersist(); big.unpersist()
  }

  test("a sub-radius bucketLength is clamped — recall survives the knob") {
    // the one-cell-per-axis recall guarantee needs cell width >= the
    // estimated radius; a caller passing a tiny bucketLength (recall-
    // safe under the old BRP-LSH, where it was pure bucket granularity)
    // must not silently lose true within-radius neighbors
    val k = 5
    val base = Snn.knnJoin(emb, emb, k, seed = 42L)
      .select("cid", "nid", "rk").collect().toSet
    val tiny = Snn.knnJoin(emb, emb, k, seed = 42L, bucketLength = 1e-6)
      .select("cid", "nid", "rk").collect().toSet
    assert(tiny == base,
      s"bucketLength=1e-6 changed the kNN graph (${tiny.size} vs ${base.size} edges)")
  }

  test("candidate-join distance is native codegen — no interpreted HOF in the plan") {
    // The distance filter is pushed into the join condition and
    // evaluated per candidate pair; an interpreted zip_with there
    // pinned the 1M-cell soak's anchor search at ~16 cores inside
    // ZipWith.eval for 20+ minutes. With the extensions injected the
    // plan must carry graft_dist2 and no higher-order lambda.
    val plan = Snn.candidatePairs(emb, emb, 5, seed = 42L)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_dist2"), plan)
    assert(!plan.contains("zip_with") && !plan.contains("lambdafunction"), plan)
    // and the native form agrees with the interpreted fallback
    val d2 = call_function("graft_dist2", col("a"), col("b"))
    val fb = aggregate(
      zip_with(col("a"), col("b"),
        (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)
    val rows = Seq(
      (Array(1.5, -2.0, 3e8), Array(1.5, -2.0, 3e8 + 1e-4)),
      (Array(0.0, 0.0, 0.0), Array(1.0, 2.0, 2.0)))
      .toDF("a", "b").select(d2.as("n"), fb.as("f")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r))
  }

  test("SNN graph + Louvain recovers the two blobs") {
    // k=10 of 14 possible in-blob neighbors: dense intra-blob SNN, so
    // the modularity optimum is the two planted communities
    val knn = Snn.knn(emb, k = 10)
    val edges = Snn.graph(knn, k = 10)
    assert(edges.filter(col("weight") > 1).count() == 0)
    val clusters = Clustering.louvain(emb.select("cells_id"), edges)
    val byCluster = clusters.collect()
      .groupBy(_.getAs[Long]("cluster"))
      .view.mapValues(_.map(_.getAs[Long]("cells_id")).toSet).toMap
    assert(byCluster.size == 2, s"expected 2 clusters, got ${byCluster.size}")
    assert(byCluster.values.toSet ==
      Set((0L until 15L).toSet, (100L until 115L).toSet))
    // deterministic renumbering: cluster 0 contains the smallest id
    assert(byCluster(0L).contains(0L))
  }

  test("label propagation (distributed fallback) never mixes blobs") {
    val knn = Snn.knn(emb, k = 5)
    val edges = Snn.graph(knn, k = 5)
    val clusters = Clustering.labelPropagation(
      emb.select("cells_id"), edges, maxIters = 10)
    val byCluster = clusters.collect()
      .groupBy(_.getAs[Long]("cluster"))
      .view.mapValues(_.map(_.getAs[Long]("cells_id")).toSet).toMap
    byCluster.values.foreach { members =>
      assert(members.forall(_ < 100) || members.forall(_ >= 100),
        s"cluster mixes blobs: $members")
    }
  }

  test("distributed modularity refinement: cliques recovered, modularity not worse than init") {
    // ring of 4 cliques (6 nodes each) bridged by single weak edges —
    // the canonical modularity fixture
    val cliques = (0 until 4).flatMap { c =>
      val ids = (0 until 6).map(i => (c * 100 + i).toLong)
      ids.combinations(2).map { case Seq(a, b) => (a, b, 1.0) }
    }
    val bridges = (0 until 4).map(c =>
      ((c * 100 + 5).toLong, (((c + 1) % 4) * 100).toLong, 0.1))
    val edges = (cliques ++ bridges).toDF("src", "dst", "weight").persist()
    val verts = (0 until 4).flatMap(c => (0 until 6).map(i => (c * 100 + i).toLong))
      .toDF("cells_id").persist()

    def modularity(assign: Map[Long, Long]): Double = {
      val sym = (cliques ++ bridges).flatMap { case (a, b, w) =>
        Seq((a, b, w), (b, a, w)) }
      val m2 = sym.map(_._3).sum
      val deg = sym.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val intra = sym.filter { case (a, b, _) => assign(a) == assign(b) }
        .map(_._3).sum
      val sumTot = assign.values.toSet.toSeq.map { c: Long =>
        val d: Double = assign.collect { case (v, cc) if cc == c => deg(v) }.sum
        d * d
      }.sum
      intra / m2 - sumTot / (m2 * m2)
    }
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val lp = toMap(Clustering.labelPropagation(verts, edges))
    val refined = toMap(Clustering.louvainDistributed(verts, edges))
    assert(refined.size == 24)
    // cliques end up whole: members of one clique share a cluster and
    // no cluster spans two cliques
    val byCluster = refined.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
    byCluster.values.foreach { members =>
      assert(members.map(_ / 100).size == 1, s"cluster spans cliques: $members")
    }
    assert(refined.groupBy(_._1 / 100).values.forall(_.values.toSet.size == 1))
    assert(modularity(refined) >= modularity(lp) - 1e-9,
      s"refined ${modularity(refined)} < lp ${modularity(lp)}")
    // deterministic
    assert(toMap(Clustering.louvainDistributed(verts, edges)) == refined)
    edges.unpersist(); verts.unpersist()
  }

  test("tsneLike keeps the blobs separated") {
    val out = Embed.tsneLike(emb, iterations = 150)
    val pts = out.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(pts.length == 30)
    val (pa, pb) = pts.partition(_._1 < 100)
    def c(ps: Array[(Long, Double, Double)]) =
      (ps.map(_._2).sum / ps.length, ps.map(_._3).sum / ps.length)
    val (ax, ay) = c(pa); val (bx, by) = c(pb)
    val inter = math.hypot(ax - bx, ay - by)
    val intra = math.max(
      pa.map(p => math.hypot(p._2 - ax, p._3 - ay)).max,
      pb.map(p => math.hypot(p._2 - bx, p._3 - by)).max)
    assert(inter > intra, s"inter=$inter intra=$intra")
  }

  test("umapLike keeps the blobs separated") {
    val knn = Snn.knn(emb, k = 5)
    val out = Embed.umapLike(emb, knn, epochs = 50)
    val pts = out.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(pts.length == 30)
    val (pa, pb) = pts.partition(_._1 < 100)
    def centroid(ps: Array[(Long, Double, Double)]) =
      (ps.map(_._2).sum / ps.length, ps.map(_._3).sum / ps.length)
    val (ax, ay) = centroid(pa); val (bx, by) = centroid(pb)
    val inter = math.hypot(ax - bx, ay - by)
    val intraA = pa.map(p => math.hypot(p._2 - ax, p._3 - ay)).max
    val intraB = pb.map(p => math.hypot(p._2 - bx, p._3 - by)).max
    assert(inter > 2 * math.max(intraA, intraB),
      s"inter=$inter intraA=$intraA intraB=$intraB")
  }

  test("landmark layout places every cell and keeps the blobs separated") {
    // two 120-cell blobs, landmark budget 40 — most cells are placed by
    // the distributed weighted-kNN interpolation, not the exact kernel
    val big = (0 until 120).map(i =>
      (i.toLong, Array(0.0 + 0.1 * (i % 12), 0.1 * (i % 7), 0.0, 0.0, 0.0))) ++
      (0 until 120).map(i =>
        (1000L + i, Array(50.0 + 0.1 * (i % 12), 50.0 + 0.1 * (i % 7), 0.0, 0.0, 0.0)))
    val df = big.toDF("cells_id", "pc").persist()
    // umap kernel: stable at a 40-point landmark budget (the driver
    // t-SNE's fixed eta=200 is tuned for the production m~2000 regime)
    val out = Embed.landmarkLayout(df, m = 40, kPlace = 5)(
      sub => Embed.umapLike(sub, Snn.knn(sub, 5), epochs = 50))
    val pts = out.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(pts.length == 240)
    assert(pts.map(_._1).distinct.length == 240)
    val (pa, pb) = pts.partition(_._1 < 1000)
    def c(ps: Array[(Long, Double, Double)]) =
      (ps.map(_._2).sum / ps.length, ps.map(_._3).sum / ps.length)
    val (ax, ay) = c(pa); val (bx, by) = c(pb)
    val inter = math.hypot(ax - bx, ay - by)
    val intra = math.max(
      pa.map(p => math.hypot(p._2 - ax, p._3 - ay)).max,
      pb.map(p => math.hypot(p._2 - bx, p._3 - by)).max)
    assert(inter > intra, s"inter=$inter intra=$intra")
    // deterministic: same seed, same layout
    val again = Embed.landmarkLayout(df, m = 40, kPlace = 5)(
      sub => Embed.umapLike(sub, Snn.knn(sub, 5), epochs = 50))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(again.sortBy(_._1).toSeq == pts.sortBy(_._1).toSeq)
    df.unpersist()
  }
}
