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

  /** Generic approximate kNN join: for each row of `query`, the k
    * nearest rows of `corpus` (both `(cells_id, pc)`), excluding
    * self-matches by id. Returns `(cid, nid, dist, rk)`. */
  def knnJoin(query: DataFrame, corpus: DataFrame, k: Int,
              seed: Long = 42L, bucketLength: Double = 10.0): DataFrame = {
    val q = query.select(col("cells_id"), array_to_vector(col("pc")).as("features"))
    val c = corpus.select(col("cells_id"), array_to_vector(col("pc")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(3).setSeed(seed)
      .setInputCol("features").setOutputCol("__h")
    val model = lsh.fit(c)
    model.approxSimilarityJoin(q, c, 1e12, "dist")
      .filter(col("datasetA.cells_id") =!= col("datasetB.cells_id"))
      .select(
        col("datasetA.cells_id").as("cid"),
        col("datasetB.cells_id").as("nid"),
        col("dist"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("cid").orderBy(col("dist").asc, col("nid").asc)))
      .filter(col("rk") <= k)
  }

  /** kNN edge table `(cid, nid, dist, rk)` from embeddings
    * `(cells_id, pc: array<double>)`. Each cell is its own 0-th
    * neighbor in Seurat; we exclude self and rank 1..k. */
  def knn(emb: DataFrame, k: Int = 20, seed: Long = 42L,
          bucketLength: Double = 10.0): DataFrame = {
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
