package graft.ml

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `FindNeighbors(k = 20)` → shared-nearest-neighbor graph
  * (`QC_helpers/configureEmbedding.r:113`).
  *
  * Spark decomposition (SURVEY §2.9): approximate kNN via seeded
  * `BucketedRandomProjectionLSH` + distance-ranked window, then the
  * SNN weight is pure relational algebra — self-join the kNN table on
  * the shared neighbor, count, Jaccard = shared/(2k − shared), prune
  * below 1/15 (Seurat default). Every stage shuffles on cell ids only.
  */
object Snn {

  /** Sample-derived kNN search radius: the max kth-NN distance over a
    * panel of query points sampled from `query`, measured against a
    * corpus sample. The corpus sample *under*-states density, so its
    * kth-NN distance already *over*-states the true one; the extra 2×
    * safety factor trades candidates for recall in the safe direction.
    * One TakeOrdered scan per side; ≤2048×dim doubles on the driver. */
  private[ml] def estimateRadius(query: DataFrame, corpus: DataFrame,
                                 k: Int, seed: Long,
                                 conservative: Boolean = false): Double = {
    // value-keyed pseudo-random sample (NOT rand(): its stream depends
    // on the partition layout, so the same data in a different layout
    // would yield a different radius)
    def sampleVecs(df: DataFrame, n: Int): Array[Array[Double]] =
      df.select(col("pc")).orderBy(xxhash64(col("pc"), lit(seed)),
          col("pc").getItem(0))
        .limit(n).collect()
        .map(_.getSeq[Double](0).toArray)
    val pts = sampleVecs(corpus, 2048)
    if (pts.length <= k) return Double.MaxValue
    val probes = sampleVecs(query, 128)
    var minPos = Double.MaxValue // smallest positive distance seen
    val kth = probes.map { p =>
      val ds = pts.map { c =>
        var s = 0.0; var i = 0
        while (i < p.length) { val d = p(i) - c(i); s += d * d; i += 1 }
        math.sqrt(s)
      }
      java.util.Arrays.sort(ds)
      var j = 0
      while (j < ds.length && ds(j) <= 0.0) j += 1
      if (j < ds.length && ds(j) < minPos) minPos = ds(j)
      ds(math.min(k, ds.length - 1))
    }
    // median probe by default: the estimator must be stable — an
    // outlier probe (a corner cell) inflating the radius inflates the
    // candidate count for the WHOLE join; the 2x factor covers the
    // upper tail of true kth-NN distances instead. `conservative` takes
    // the max probe: for queries that must reach across a gap (anchor
    // search between batches), missing neighbors is the failure mode,
    // not candidate volume.
    java.util.Arrays.sort(kth)
    val r = (if (conservative) kth(kth.length - 1) else kth(kth.length / 2)) * 2.0
    if (r > 0 && java.lang.Double.isFinite(r)) r
    // kth distance 0 means >= k COINCIDENT points (PCR duplicates,
    // zero-expression cells collapsing in PCA): the true neighbors sit
    // at distance 0, so a small positive radius reaches them — prefer
    // the smallest positive kth among probes (a real k-neighborhood
    // scale), then the smallest positive distance seen, NEVER the
    // infinite radius, which flips the whole join quadratic (surfaced
    // by the domain soak: duplicate-heavy synthetic cells spilled
    // >78 GB of candidate pairs under the old MaxValue degradation)
    else kth.find(_ > 0).map(_ * 2.0)
      .orElse(if (minPos < Double.MaxValue) Some(minPos * 2.0) else None)
      .getOrElse(1.0) // every sampled point identical: scale arbitrary
  }

  /** Generic approximate kNN join: for each row of `query`, the k
    * nearest rows of `corpus` (both `(cells_id, pc)`), excluding
    * self-matches by id. Returns `(cid, nid, dist, rk)`.
    *
    * Scale posture (reference semantics: configureEmbedding.r:113): the
    * LSH similarity join runs with a FINITE data-derived radius and a
    * data-derived bucket length (pass `bucketLength <= 0` to derive
    * both from a sample), so bucket occupancy — and with it the
    * candidate-pair count — tracks the true k-neighborhood instead of
    * growing quadratically with density. Survivors are then top-k
    * pruned in two stages: a per-shuffle-partition rank caps any one
    * cell's candidates at partitions×k before the global per-cell rank,
    * so a skewed/hot cell never funnels its whole candidate set through
    * one window partition. */
  def knnJoin(query: DataFrame, corpus: DataFrame, k: Int,
              seed: Long = 42L, bucketLength: Double = 0.0,
              conservative: Boolean = false): DataFrame =
    rankCandidates(
      candidatePairs(query, corpus, k, seed, bucketLength, conservative), k)

  /** Radius-bounded LSH candidate set `(cid, nid, dist)` — the stage
    * whose size must stay O(n·k) as data grows (asserted in GraphSpec). */
  private[ml] def candidatePairs(query: DataFrame, corpus: DataFrame, k: Int,
                                 seed: Long, bucketLength: Double = 0.0,
                                 conservative: Boolean = false): DataFrame = {
    val radius = estimateRadius(query, corpus, k, seed, conservative)
    val bl =
      if (bucketLength > 0) bucketLength
      else if (java.lang.Double.isFinite(radius) && radius < Double.MaxValue) radius
      else 10.0
    val q = query.select(col("cells_id"), array_to_vector(col("pc")).as("features"))
    val c = corpus.select(col("cells_id"), array_to_vector(col("pc")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bl).setNumHashTables(3).setSeed(seed)
      .setInputCol("features").setOutputCol("__h")
    val model = lsh.fit(c)
    model.approxSimilarityJoin(q, c, radius, "dist")
      .filter(col("datasetA.cells_id") =!= col("datasetB.cells_id"))
      .select(
        col("datasetA.cells_id").as("cid"),
        col("datasetB.cells_id").as("nid"),
        col("dist"))
  }

  /** Skew-safe two-stage top-k over the candidate set. */
  private def rankCandidates(candidates: DataFrame, k: Int): DataFrame =
    candidates
      .withColumn("__pid", spark_partition_id())
      .withColumn("__prk", row_number().over(
        Window.partitionBy("cid", "__pid")
          .orderBy(col("dist").asc, col("nid").asc)))
      .filter(col("__prk") <= k)
      .drop("__pid", "__prk")
      .withColumn("rk", row_number().over(
        Window.partitionBy("cid").orderBy(col("dist").asc, col("nid").asc)))
      .filter(col("rk") <= k)

  /** kNN edge table `(cid, nid, dist, rk)` from embeddings
    * `(cells_id, pc: array<double>)`. Each cell is its own 0-th
    * neighbor in Seurat; we exclude self and rank 1..k. */
  def knn(emb: DataFrame, k: Int = 20, seed: Long = 42L,
          bucketLength: Double = 0.0): DataFrame = {
    val vecs = emb
      .select(col("cells_id"), col("pc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    knnJoin(vecs, vecs, k, seed, bucketLength)
  }

  /** SNN edges `(src, dst, weight)` with src < dst, Jaccard-weighted
    * over the k-neighborhoods (self counted as its own neighbor, as in
    * Seurat), pruned at `prune`. */
  def graph(knnEdges: DataFrame, k: Int, prune: Double = 1.0 / 15): DataFrame = {
    // neighborhood incl. self
    val nbr = knnEdges.select("cid", "nid")
      .unionByName(knnEdges.select(col("cid"), col("cid").as("nid")).distinct())
    val shared = nbr.as("a")
      .join(nbr.as("b"), col("a.nid") === col("b.nid") &&
        col("a.cid") < col("b.cid"))
      .groupBy(col("a.cid").as("src"), col("b.cid").as("dst"))
      .agg(count(lit(1)).as("shared"))
    shared
      .withColumn("weight",
        col("shared").cast("double") / (lit(2 * (k + 1)) - col("shared")))
      .filter(col("weight") >= prune)
      .select("src", "dst", "weight")
  }
}
