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
  * positive class, so a gradient-boosted-tree model (Spark ML
  * `GBTClassifier` — the in-engine analog of scDblFinder's xgboost,
  * same boosted-trees family, seeded) is fit on ALL cells (real +
  * artificial) over per-cell features mirroring scDblFinder's
  * kNN-derived set: artificial-neighbor fraction at two neighborhood
  * scales, distance-weighted artificial fraction, rank of the first
  * artificial neighbor, mean neighbor distance (local density), log
  * library size, log feature count. Each real cell's `doublet_scores`
  * is the model's predicted doublet probability; `doublet` when it
  * passes `probabilityThreshold` — the 0.5 default the reference
  * configures (`4_Prepare_experiment.r: config.doubletScores`).
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
    Concurrency.mapSamples(samples.toIndexedSeq)(s =>
        scoreSample(expr.filter(col("sample") === s), s, k, numHvg, numPcs,
          seed, probabilityThreshold))
      .reduce(_ unionByName _)
  }

  private def scoreSample(expr: DataFrame, sample: String, k: Int,
                          numHvg: Int, numPcs: Int, seed: Long,
                          probabilityThreshold: Double): DataFrame =
    featurize(expr, sample, k, numHvg, numPcs, seed) match {
      case None =>
        // a 1-cell sample cannot host a doublet: pass through as singlet
        // (no artificial class exists, so there is nothing to train on)
        expr.select("sample", "barcode").distinct()
          .withColumn("doublet_scores", lit(0.0))
          .withColumn("doublet_class", lit("singlet"))
      case Some(feats) =>
        classify(feats, sample, k, seed, probabilityThreshold)
    }

  /** The featurization stage, exposed package-private for spec-level
    * inspection: per-cell classifier features over real + artificial
    * cells, persisted and materialized (internal caches released).
    * None when the sample cannot host an artificial class. */
  private[ml] def featurize(expr: DataFrame, sample: String, k: Int,
                            numHvg: Int, numPcs: Int,
                            seed: Long): Option[DataFrame] = {
    val spark = expr.sparkSession
    import spark.implicits._

    val bc = expr.select("barcode").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nReal = bc.count()
    val nArt = nReal / 2
    if (nArt == 0) {
      bc.unpersist()
      return None
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
    // emerge, with artificial-neighbor fraction 0. All neighborhood
    // features come from the ONE ranked table — no extra shuffles.
    val kInner = math.max(1, k / 2)
    val artFrac = ranked
      .groupBy(col("cid").as("cells_id"))
      .agg(
        (count(when(col("n_art"), 1)).cast("double") / count(lit(1)))
          .as("art_frac"),
        (count(when(col("n_art") && col("rk") <= kInner, 1)).cast("double") /
          greatest(count(when(col("rk") <= kInner, 1)), lit(1L)).cast("double"))
          .as("art_frac_inner"),
        (sum(when(col("n_art"), lit(1.0) / (lit(1.0) + col("dist"))))
          .cast("double") /
          sum(lit(1.0) / (lit(1.0) + col("dist"))))
          .as("w_art_frac"),
        min(when(col("n_art"), col("rk"))).as("first_art_rk"),
        avg(col("dist")).as("mean_dist"))
    // sentinel for cells with NO neighbor inside the bounded radius:
    // the largest observed neighbor distance (the radius bound), NOT
    // 0.0 — zero reads as maximal local density, the opposite of the
    // truth for exactly the isolated cells this feature describes
    val distCap = ranked.agg(
      coalesce(max(col("dist")), lit(1.0)).as("__dist_cap"))
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
      .withColumn("art_frac_inner", coalesce(col("art_frac_inner"), lit(0.0)))
      .withColumn("w_art_frac", coalesce(col("w_art_frac"), lit(0.0)))
      // no artificial neighbor within k (or no neighbors at all) →
      // sentinel rank one past the last slot, the bounded null-free form
      .withColumn("first_art_rk",
        coalesce(col("first_art_rk"), lit(k + 1)).cast("double"))
      .crossJoin(broadcast(distCap))
      .withColumn("mean_dist", coalesce(col("mean_dist"), col("__dist_cap")))
      .drop("__dist_cap")
      .join(libs, "cells_id")
      .withColumn("features", org.apache.spark.ml.functions.array_to_vector(
        array(col("art_frac"), col("art_frac_inner"), col("w_art_frac"),
          col("first_art_rk"), col("mean_dist"),
          col("log_lib"), col("log_nfeat"))))
      .withColumn("label", col("is_art").cast("double"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    feats.count()
    bc.unpersist(); combined.unpersist(); normHvg.unpersist()
    tagged.unpersist()
    Some(feats)
  }

  /** Train + score from a materialized feature table; releases it. */
  private def classify(feats: DataFrame, sample: String, k: Int, seed: Long,
                       probabilityThreshold: Double): DataFrame = {
    // scDblFinder-style classifier: artificial doublets are the labeled
    // positive class; boosted trees (the reference's xgboost family),
    // seeded for determinism
    val gbt = new org.apache.spark.ml.classification.GBTClassifier()
      .setMaxIter(20).setMaxDepth(3).setStepSize(0.1)
      .setMinInstancesPerNode(5)
      .setSeed(seed ^ sample.hashCode.toLong)
      .setFeaturesCol("features").setLabelCol("label")
      .setProbabilityCol("__prob")
    // Two defenses scDblFinder itself uses against the trap inherent
    // to this training scheme — every real doublet is LABELED real, so
    // a flexible model fit naively memorizes the very cells the score
    // must flag:
    //  1. OUT-OF-FOLD round 1: real cells are hash-split into folds
    //     (artificial cells train every model) and each fold is scored
    //     by the model that never saw it.
    //  2. ITERATIVE EXCLUSION round 2: real cells in the top decile of
    //     round-1 scores are presumed doublets and EXCLUDED from the
    //     real training class, then everything is rescored — without
    //     this, co-located real doublets still vouch for each other
    //     across folds (each one's held-out model trains on the
    //     others, labeled real, at the same feature point).
    // Deterministic: fold assignment is a seeded hash, the learner is
    // seeded, the exclusion cut is an exact distributed order
    // statistic (aggregation-only — no scored cells on the driver).
    val numFolds = 3
    val withFold = feats.withColumn("__fold",
      when(col("is_art"), lit(-1)).otherwise(
        pmod(xxhash64(col("barcode"), lit(seed)), lit(numFolds)).cast("int")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val realFolds = withFold.filter(!col("is_art"))
      .select("__fold").distinct().collect().map(_.getInt(0)).sorted
    val round1 =
      if (realFolds.length < 2) {
        // all real cells hashed into one fold: holding it out would
        // leave a single-class training set — score in-sample instead
        gbt.fit(withFold).transform(withFold.filter(!col("is_art")))
      } else realFolds.map { f =>
        gbt.fit(withFold.filter(col("__fold") =!= f))
          .transform(withFold.filter(!col("is_art") && col("__fold") === f))
      }.reduce(_ unionByName _)
    val p1 = round1.select(col("cells_id"),
      org.apache.spark.ml.functions.vector_to_array(col("__prob"))
        .getItem(1).as("__p1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nReal = p1.count()
    val nExcl = math.max(1L, math.ceil(nReal * 0.1).toLong)
    // the exclusion cut = min of the top nExcl scores, as a distributed
    // aggregation (no TakeOrdered of scored cells, no driver list, no
    // .toInt ceiling). percentile interpolates at index p*(n-1); aiming
    // at the HALF-INTEGER position (nReal-nExcl-0.5) lands the raw
    // value strictly between the two straddling order statistics (or
    // exactly on them when tied), so snapping to the smallest actual
    // score >= it reproduces the exact order statistic — equal to the
    // former orderBy.limit driver form except sub-ulp ties (straddling
    // scores ~1 ulp apart can round the midpoint onto the lower one and
    // snap the cut one rank low; GBT scores never resolve that finely).
    // Note percentile's final merge buffers the distinct __p1 values in
    // one aggregation task — O(nReal) peak in a task for continuous
    // scores: moved OFF the driver, not eliminated. Swap in
    // approx_percentile(+snap) if nReal ever makes that task the limit.
    val p = if (nReal - nExcl <= 0L) 0.0
            else (nReal - nExcl - 0.5) / (nReal - 1).toDouble
    val thrRaw = p1.agg(expr(s"percentile(__p1, $p)"))
      .collect()(0).getDouble(0)
    val thr = p1.filter(col("__p1") >= thrRaw)
      .agg(min(col("__p1"))).collect()(0).getDouble(0)
    val train2 = withFold.join(p1, Seq("cells_id"), "left")
      .filter(col("is_art") || col("__p1") < thr).drop("__p1")
    val out0 =
      if (train2.filter(!col("is_art")).isEmpty)
        round1 // degenerate flat scores: round 2 would be single-class
      else
        gbt.fit(train2).transform(withFold.filter(!col("is_art")))
    val out = out0
      .withColumn("doublet_scores",
        org.apache.spark.ml.functions.vector_to_array(col("__prob"))
          .getItem(1))
      .withColumn("doublet_class",
        when(col("doublet_scores") >= probabilityThreshold, "doublet")
          .otherwise("singlet"))
      .select("sample", "barcode", "doublet_scores", "doublet_class")
    val result = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    result.count()
    feats.unpersist(); withFold.unpersist(); p1.unpersist()
    result
  }
}
