package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Doublet scoring — scDblFinder semantics (`2-2_Compute-metrics_
  * doublets.r:34-36`): simulate artificial doublets by summing random
  * cell pairs, embed real + artificial together, and score each real
  * cell by the artificial fraction of its k nearest neighbors.
  *
  * Spark decomposition (SURVEY §2.9): pair table → grouped sum (the
  * doublet synthesis is a join + agg on the long table), the existing
  * LogNormalize → HVG → Scale → PCA pipeline for the embedding, and
  * the bounded [[Snn.knnJoin]] for the kNN — every stage distributed,
  * seeded, and deterministic (pairing hashes each barcode with the
  * seed and pairs consecutive dense ranks; no driver materialization).
  *
  * Classification (simplified vs scDblFinder's trained classifier,
  * documented choice): `doublet` when the artificial-neighbor fraction
  * exceeds 1.5× its null expectation `nArt/(nArt + nReal)`.
  */
object Doublets {

  def scores(expr: DataFrame, k: Int = 20, numHvg: Int = 500,
             numPcs: Int = 10, seed: Long = 123L): DataFrame = {
    val spark = expr.sparkSession
    val samples = expr.select("sample").distinct()
      .collect().map(_.getString(0)).sorted
    // independent per-sample pipelines submitted concurrently (each is
    // seeded by sample name — order of completion cannot change scores)
    Concurrency.mapSamples(samples)(s =>
        scoreSample(expr.filter(col("sample") === s), s, k, numHvg, numPcs, seed))
      .reduce(_ unionByName _)
  }

  private def scoreSample(expr: DataFrame, sample: String, k: Int,
                          numHvg: Int, numPcs: Int, seed: Long): DataFrame = {
    val spark = expr.sparkSession
    import spark.implicits._

    val bc = expr.select("barcode").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nReal = bc.count()
    val nArt = nReal / 2
    if (nArt == 0) {
      // a 1-cell sample cannot host a doublet: pass through as singlet
      // (expected fraction would be 0 and misclassify everything)
      bc.unpersist()
      return expr.select("sample", "barcode").distinct()
        .withColumn("doublet_scores", lit(0.0))
        .withColumn("doublet_class", lit("singlet"))
    }
    // deterministic DISTRIBUTED pairing: a seeded hash gives every
    // barcode a pseudo-random rank, a two-pass dense id turns the rank
    // into a permutation index, and consecutive indices pair up — no
    // O(cells) barcode list ever reaches the driver
    val keyed = bc.withColumn("__k",
      xxhash64(col("barcode"), lit(seed ^ sample.hashCode.toLong)))
    val pairs = graft.operators.DenseId
      .withDenseId(keyed, Seq(col("__k"), col("barcode")), "__idx")
      .filter(col("__idx") < lit(2L * nArt))
      .select(col("barcode"),
        format_string("__art_%06d", shiftright(col("__idx"), 1)).as("art_barcode"))

    val artExpr = expr.join(pairs, "barcode")
      .groupBy(col("sample"), col("art_barcode").as("barcode"), col("gene"))
      .agg(sum("count").as("count"))
      .select("sample", "barcode", "gene", "count")
    val combined = expr.select("sample", "barcode", "gene", "count")
      .unionByName(artExpr)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val nCells = nReal + nArt
    val norm = Normalize.logNormalize(combined)
    val hvg = Hvg.selectHvg(norm, nCells, numGenes = numHvg, valueCol = "norm")
    val ords = Hvg.ordinals(hvg)
    // the HVG-restricted normalized table feeds both the moments pass
    // and the scaling pass — cache it once instead of re-normalizing
    val normHvg = norm.join(ords, "gene")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val moments = Scale.geneMoments(normHvg, nCells)
    val scaled = Scale.scaleData(normHvg, moments)
    val ids = graft.operators.DenseId.withDenseId(
      combined.select("sample", "barcode").distinct(),
      Seq(col("sample"), col("barcode")), "cells_id")
    val zeroZ = Scale.zeroZ(moments).join(ords, "gene")
      .select("gene_ord", "z0").collect()
      .sortBy(_.getInt(0)).map(_.getDouble(1))
    val pcaIn = scaled.join(ids, Seq("sample", "barcode"))
      .select("cells_id", "gene_ord", "z")
    val (emb, _) = Pca.fit(pcaIn, zeroZ, k = numPcs,
      allCells = Some(ids.select("cells_id")))

    val tagged = emb.join(ids, "cells_id")
      .withColumn("is_art", col("barcode").startsWith("__art_"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bounded kNN (radius + bucket length derived from the data, skew-
    // safe two-stage rank) — the same scale posture as Snn.knn
    val ranked = Snn.knnJoin(
        tagged.filter(!col("is_art")).select("cells_id", "pc"),
        tagged.select("cells_id", "pc"), k, seed)
      .join(tagged.select(col("cells_id").as("nid"),
        col("is_art").as("n_art")), "nid")
    val expected = nArt.toDouble / (nArt + nReal)
    // LEFT join from the full real-cell set: an isolated cell whose
    // kth-NN lies beyond the bounded radius has NO ranked rows — it
    // must still emerge, with 0 artificial neighbors = score 0/singlet
    // (the same contract the unbounded-radius join used to guarantee)
    val scoresByCell = ranked
      .groupBy("cid")
      .agg((count(when(col("n_art"), 1)).cast("double") / count(lit(1)))
        .as("doublet_scores"))
    val out = tagged.filter(!col("is_art"))
      .select(col("cells_id").as("cid"), col("sample"), col("barcode"))
      .join(scoresByCell, Seq("cid"), "left")
      .withColumn("doublet_scores",
        coalesce(col("doublet_scores"), lit(0.0)))
      .withColumn("doublet_class",
        when(col("doublet_scores") >= expected * 1.5, "doublet")
          .otherwise("singlet"))
      .select("sample", "barcode", "doublet_scores", "doublet_class")
    val result = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    result.count()
    bc.unpersist(); combined.unpersist(); normHvg.unpersist(); tagged.unpersist()
    result
  }
}
