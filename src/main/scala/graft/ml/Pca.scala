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
    val (pc, varExp) =
      mat.toRowMatrix().computePrincipalComponentsAndExplainedVariance(kEff)
    val emb = mat.multiply(pc)
    import spark.implicits._
    val embDf = emb.rows
      .map(r => (r.index, r.vector.toArray))
      .toDF("cells_id", "pc")
    (embDf, varExp.toArray)
  }
}
