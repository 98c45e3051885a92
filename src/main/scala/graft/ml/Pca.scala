package graft.ml

import org.apache.spark.mllib.linalg.Vectors
import org.apache.spark.mllib.linalg.distributed.{IndexedRow, IndexedRowMatrix}
import org.apache.spark.sql.DataFrame

/** `RunPCA(npcs = 50)` (`QC_helpers/dataIntegration.r:109`; scree
  * variance at `:35-36`) on the scaled HVG matrix.
  *
  * Input is the sparse scaled table `(cells_id, gene_ord, z)` plus the
  * per-gene implicit-zero z-vector; rows are densified per cell inside
  * a mapPartitions (cells × numGenes ≤ 2000 doubles — 16 KB/row), the
  * 2000×2000 covariance is computed distributed by MLlib's Gramian,
  * and only the eigen-decomposition runs on the driver. Embeddings
  * come from `IndexedRowMatrix.multiply`, keeping `cells_id` keys
  * aligned end-to-end.
  */
object Pca {

  /** Returns (embeddings `(cells_id, pc: array<double>)`,
    * variance-explained per component). `allCells` supplies the id
    * universe: a cell with NO nonzero entry on the selected genes has
    * no row in `scaled` but still owns the all-z0 dense row — without
    * it the cell would silently vanish from the embedding. */
  def fit(scaled: DataFrame, zeroZByOrd: Array[Double], k: Int = 50,
          allCells: Option[DataFrame] = None): (DataFrame, Array[Double]) = {
    val spark = scaled.sparkSession
    val nGenes = zeroZByOrd.length
    val kEff = math.min(k, nGenes)
    val bz = spark.sparkContext.broadcast(zeroZByOrd)
    val grouped = scaled
      .select("cells_id", "gene_ord", "z").rdd
      .map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2))))
      .aggregateByKey(List.empty[(Int, Double)])(
        (acc, v) => v :: acc, (a, b) => a ::: b)
    def mkRow(cid: Long, nz: List[(Int, Double)]): IndexedRow = {
      val arr = bz.value.clone()
      nz.foreach { case (g, z) => arr(g) = z }
      IndexedRow(cid, Vectors.dense(arr))
    }
    val rows = allCells match {
      case Some(ids) => ids.select("cells_id").rdd
        .map(r => (r.getLong(0), ()))
        .leftOuterJoin(grouped)
        .map { case (cid, (_, nz)) => mkRow(cid, nz.getOrElse(Nil)) }
      case None => grouped.map { case (cid, nz) => mkRow(cid, nz) }
    }
    val mat = new IndexedRowMatrix(rows)
    mat.rows.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // covariance is computed distributed (MLlib Gramian); the d×d
    // eigen-decomposition runs on the driver via eigSym (LAPACK dsyevd)
    // rather than RowMatrix's breeze svd (dgesdd): divide-and-conquer
    // SVD fails to converge on covariances with tightly repeated
    // eigenvalues — the domain soak's 20k-cell synthetic sample, whose
    // duplicated expression patterns produce exactly that spectrum,
    // killed the doublets stage through this path — while the
    // symmetric-tridiagonal eigensolver is robust there, and an
    // eigen-decomposition is the mathematically exact operation for a
    // symmetric PSD covariance anyway
    val covMat = mat.toRowMatrix().computeCovariance()
    val d = covMat.numCols
    val bm = new breeze.linalg.DenseMatrix(d, d, covMat.toArray)
    val es = breeze.linalg.eigSym(bm)
    val top = (0 until d).sortBy(i => (-es.eigenvalues(i), i)).take(kEff)
    val pcArr = new Array[Double](d * kEff)
    top.zipWithIndex.foreach { case (c, j) =>
      // deterministic sign: the largest-|component| entry (first on
      // ties) is positive, so embeddings don't depend on LAPACK's
      // arbitrary eigenvector orientation
      var mi = 0
      var i = 1
      while (i < d) {
        if (math.abs(es.eigenvectors(i, c)) > math.abs(es.eigenvectors(mi, c))) mi = i
        i += 1
      }
      val s = if (es.eigenvectors(mi, c) < 0) -1.0 else 1.0
      i = 0
      while (i < d) { pcArr(j * d + i) = s * es.eigenvectors(i, c); i += 1 }
    }
    val pc = new org.apache.spark.mllib.linalg.DenseMatrix(d, kEff, pcArr)
    val trace = (0 until d).map(i => bm(i, i)).sum
    val varExp = top.map(c =>
      math.max(0.0, es.eigenvalues(c)) / math.max(trace, Double.MinPositiveValue))
      .toArray
    val emb = mat.multiply(pc)
    import spark.implicits._
    val embDf = emb.rows
      .map(r => (r.index, r.vector.toArray))
      .toDF("cells_id", "pc")
    (embDf, varExp.toArray)
  }
}
