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
  * Classification follows scDblFinder's trained-classifier design
  * (`2-2:34-36` semantics): the artificial doublets are a LABELED
  * positive class, so a logistic model is fit on ALL cells (real +
  * artificial) over per-cell features — artificial-neighbor fraction,
  * log library size, log feature count — and each real cell's
  * `doublet_scores` is the model's predicted doublet probability
  * (scDblFinder trains xgboost on the same artificial-vs-real task; a
  * distributed seeded logistic fit is the Spark-honest analog).
  * `doublet` when the probability passes `probabilityThreshold` —
  * the 0.5 default the reference configures
  * (`4_Prepare_experiment.r: config.doubletScores`).
  */
object Doublets {

  def scores(expr: DataFrame, k: Int = 20, numHvg: Int = 500,
             numPcs: Int = 10, seed: Long = 123L,
             probabilityThreshold: Double = 0.5): DataFrame = {
    val spark = expr.sparkSession
    import spark.implicits._
    val samples = expr.select("sample").distinct()
      .collect().map(_.getString(0)).sorted
    if (samples.isEmpty)
      return Seq.empty[(String, String, Double, String)]
        .toDF("sample", "barcode", "doublet_scores", "doublet_class")
    // independent per-sample pipelines submitted concurrently (each is
    // seeded by sample name — order of completion cannot change scores)
    Concurrency.mapSamples(samples)(s =>
        scoreSample(expr.filter(col("sample") === s), s, k, numHvg, numPcs,
          seed, probabilityThreshold))
      .reduce(_ unionByName _)
  }

  private def scoreSample(expr: DataFrame, sample: String, k: Int,
                          numHvg: Int, numPcs: Int, seed: Long,
                          probabilityThreshold: Double): DataFrame = {
    val spark = expr.sparkSession
    import spark.implicits._

    val bc = expr.select("barcode").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nReal = bc.count()
    val nArt = nReal / 2
    if (nArt == 0) {
      // a 1-cell sample cannot host a doublet: pass through as singlet
      // (no artificial class exists, so there is nothing to train on)
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
    // bounded kNN over ALL cells (real + artificial are both featurized
    // — the artificial class is the training signal), radius + bucket
    // length derived from the data, skew-safe two-stage rank
    val ranked = Snn.knnJoin(
        tagged.select("cells_id", "pc"),
        tagged.select("cells_id", "pc"), k, seed)
      .join(tagged.select(col("cells_id").as("nid"),
        col("is_art").as("n_art")), "nid")
    // LEFT join from the full cell set: an isolated cell whose kth-NN
    // lies beyond the bounded radius has NO ranked rows — it must still
    // emerge, with artificial-neighbor fraction 0
    val artFrac = ranked
      .groupBy(col("cid").as("cells_id"))
      .agg((count(when(col("n_art"), 1)).cast("double") / count(lit(1)))
        .as("art_frac"))
    // per-cell library features from the combined matrix
    val libs = combined
      .groupBy("sample", "barcode")
      .agg(sum("count").as("lib"), count(lit(1)).as("nfeat"))
      .join(ids, Seq("sample", "barcode"))
      .select(col("cells_id"), log1p(col("lib")).as("log_lib"),
        log1p(col("nfeat")).as("log_nfeat"))
    val feats = tagged
      .join(artFrac, Seq("cells_id"), "left")
      .withColumn("art_frac", coalesce(col("art_frac"), lit(0.0)))
      .join(libs, "cells_id")
      .withColumn("features", org.apache.spark.ml.functions.array_to_vector(
        array(col("art_frac"), col("log_lib"), col("log_nfeat"))))
      .withColumn("label", col("is_art").cast("double"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // scDblFinder-style classifier: artificial doublets are the labeled
    // positive class; predict each real cell's doublet probability
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(50).setRegParam(1e-3)
      .setFeaturesCol("features").setLabelCol("label")
      .setProbabilityCol("__prob")
    val model = lr.fit(feats)
    val out = model.transform(feats.filter(!col("is_art")))
      .withColumn("doublet_scores",
        org.apache.spark.ml.functions.vector_to_array(col("__prob"))
          .getItem(1))
      .withColumn("doublet_class",
        when(col("doublet_scores") >= probabilityThreshold, "doublet")
          .otherwise("singlet"))
      .select("sample", "barcode", "doublet_scores", "doublet_class")
    val result = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    result.count()
    bc.unpersist(); combined.unpersist(); normHvg.unpersist()
    tagged.unpersist(); feats.unpersist()
    result
  }
}
