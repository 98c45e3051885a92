package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `FindClusters` (`QC_helpers/configureEmbedding.r:114`) — community
  * detection on the SNN graph.
  *
  * v1 is deterministic weighted label propagation (the staged fallback
  * of SURVEY §7.3; Louvain modularity refinement is a later round).
  * Implemented on DataFrames rather than GraphX's LabelPropagation
  * because the latter's tie-breaking is map-iteration-order dependent:
  * here ties break on the smallest label, so the result is a pure
  * function of the graph. Each iteration is one join + one grouped
  * sum + one window — all keyed by vertex id.
  *
  * Cluster ids are renumbered 0..C−1 by ascending min member id
  * (deterministic-ordinal convention, SURVEY §2.10).
  */
object Clustering {

  /** `(cells_id, cluster)` from SNN edges `(src, dst, weight)`.
    * `vertices` supplies isolated cells (they keep singleton labels). */
  def labelPropagation(vertices: DataFrame, edges: DataFrame,
                       maxIters: Int = 10): DataFrame = {
    val sym = edges.select(col("src"), col("dst"), col("weight"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst"), col("weight")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // localCheckpoint each iteration: an iterative self-referencing
    // plan otherwise grows exponentially deep and blows up at analysis
    var labels = vertices.select(col("cells_id"), col("cells_id").as("label"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (iter < maxIters && changed > 0) {
      val votes = sym
        .join(labels.withColumnRenamed("cells_id", "dst"), "dst")
        .groupBy(col("src"), col("label"))
        .agg(sum("weight").as("w"))
      val best = votes
        .withColumn("rk", row_number().over(
          Window.partitionBy("src").orderBy(col("w").desc, col("label").asc)))
        .filter(col("rk") === 1)
        .select(col("src").as("cells_id"), col("label").as("new_label"))
      val next = labels
        .join(best, Seq("cells_id"), "left")
        .select(col("cells_id"),
          coalesce(col("new_label"), col("label")).as("label"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("label", "old"), "cells_id")
        .filter(col("label") =!= col("old")).count()
      labels = next
      iter += 1
    }
    sym.unpersist()
    // renumber clusters by ascending min member id
    val renum = labels.groupBy("label")
      .agg(min("cells_id").as("rep"))
      .withColumn("cluster",
        (row_number().over(Window.orderBy(col("rep").asc)) - 1).cast("long"))
      .select("label", "cluster")
    labels.join(renum, "label").select("cells_id", "cluster")
  }

  /** Louvain modularity clustering via the [[Louvain]] driver kernel —
    * the reference-parity path (`configureEmbedding.r:114`). The edge
    * list is post-reduction (≤ cells × k rows); only it is collected,
    * matching the reference's igraph locality. */
  def louvain(vertices: DataFrame, edges: DataFrame,
              resolution: Double = 1.0): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val ids = vertices.select("cells_id").collect().map(_.getLong(0)).sorted
    val idx = ids.zipWithIndex.toMap
    val es = edges.select("src", "dst", "weight").collect()
      .map(r => (idx(r.getLong(0)), idx(r.getLong(1)), r.getDouble(2)))
      .sortBy(e => (e._1, e._2))
    val comm = Louvain.communities(ids.length, es, resolution)
    ids.indices.map(i => (ids(i), comm(i).toLong)).toDF("cells_id", "cluster")
  }
}
