package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Anchor-based batch integration, v1 — the Seurat-v4 step
  * (`QC_helpers/dataIntegration.r:90-97`: split by group, find anchor
  * pairs in reduced space, integrate; SURVEY §7.4 ranks this hardest).
  *
  * v1 semantics (published MNN-correct lineage, Haghverdi et al. 2018,
  * which Seurat's anchor search refines):
  *  1. the first group (ascending order) is the reference;
  *  2. anchors between the reference and each other group = MUTUAL
  *     nearest neighbors in the joint PCA space (two LSH kNN joins,
  *     intersected);
  *  3. each anchor carries a correction vector (ref PC − query PC);
  *  4. every query cell is corrected by the distance-weighted mean of
  *     its `kWeight` nearest anchors' vectors (weights 1/(1+d), the
  *     blend is a posexplode + grouped weighted sum — fully
  *     relational, no driver kernel).
  * Groups with no anchors pass through uncorrected (matches the
  * reference's skip branch `dataIntegration.r:86-89` spirit).
  */
object Integration {

  /** `pca`: `(cells_id, pc)`; `groups`: `(cells_id, group)`.
    * Returns `(cells_id, pc)` with non-reference groups corrected into
    * the reference's space. */
  def integrateEmbeddings(pca: DataFrame, groups: DataFrame,
                          kAnchor: Int = 5, kWeight: Int = 5,
                          seed: Long = 42L): DataFrame = {
    val spark = pca.sparkSession
    val tagged = pca.join(groups, "cells_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val groupNames = tagged.select("group").distinct()
      .collect().map(_.getString(0)).sorted
    if (groupNames.length < 2) {
      val passThrough = tagged.select("cells_id", "pc").localCheckpoint(true)
      tagged.unpersist()
      return passThrough
    }
    val ref = tagged.filter(col("group") === groupNames.head)
      .select("cells_id", "pc")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val toRelease = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val corrected = groupNames.tail.map { g =>
      val qry = tagged.filter(col("group") === g).select("cells_id", "pc")
      // mutual nearest neighbors = anchor pairs
      val q2r = Snn.knnJoin(qry, ref, kAnchor, seed)
        .select(col("cid").as("qid"), col("nid").as("rid"))
      val r2q = Snn.knnJoin(ref, qry, kAnchor, seed)
        .select(col("nid").as("qid"), col("cid").as("rid"))
      val anchors = q2r.intersect(r2q)
        .join(qry.select(col("cells_id").as("qid"), col("pc").as("qpc")), "qid")
        .join(ref.select(col("cells_id").as("rid"), col("pc").as("rpc")), "rid")
        .select(col("qid"), col("qpc"),
          zip_with(col("rpc"), col("qpc"), (r, q) => r - q).as("vec"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      toRelease += anchors
      if (anchors.isEmpty) qry
      else {
        // each query cell's kWeight nearest anchor query-side points
        val anchorPts = anchors.select(col("qid").as("cells_id"), col("qpc").as("pc"))
          .dropDuplicates("cells_id")
        val near = Snn.knnJoin(qry, anchorPts, kWeight, seed)
          .select(col("cid").as("cells_id"), col("nid").as("aid"),
            (lit(1.0) / (lit(1.0) + col("dist"))).as("w"))
        // allow self-anchor (a query cell that IS an anchor corrects by
        // its own vector too): knnJoin excluded self, so union it back
        val selfA = anchorPts.select(col("cells_id"), col("cells_id").as("aid"),
          lit(1.0).as("w"))
        // an anchor cell paired with several ref cells contributes one
        // row per pair (each with the cell's weight) — deterministic,
        // unlike collapsing to an arbitrary "first" vector
        val weighted = near.unionByName(selfA)
          .join(anchors.select(col("qid").as("aid"), col("vec")), "aid")
        // blend: posexplode vectors, grouped weighted mean per dim
        val blended = weighted
          .select(col("cells_id"), col("w"), posexplode(col("vec")).as(Seq("d", "v")))
          .groupBy("cells_id", "d")
          .agg((sum(col("w") * col("v")) / sum(col("w"))).as("corr"))
          .groupBy("cells_id")
          .agg(map_from_arrays(collect_list("d"), collect_list("corr")).as("corrmap"))
        qry.join(blended, Seq("cells_id"), "left")
          .select(col("cells_id"),
            when(col("corrmap").isNull, col("pc")).otherwise(
              zip_with(col("pc"),
                transform(sequence(lit(0), size(col("pc")) - 1),
                  i => element_at(col("corrmap"), i)),
                (p, c) => p + coalesce(c, lit(0.0)))).as("pc"))
      }
    }
    // materialize before releasing the cached inputs the lineage reads
    val out = (ref +: corrected).reduce(_ unionByName _).localCheckpoint(true)
    toRelease.foreach(_.unpersist())
    tagged.unpersist(); ref.unpersist()
    out
  }
}
