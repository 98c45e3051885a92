// Domain soak, round 13 (r12 verdict item 1): the 16M-barcode decade
// with the BOUNDED CORRECTION stage. The 8M leg froze the anchor
// SEARCH at O(m) (maxAnchorCells = 50k) and named the next knob: the
// correction's knnJoin candidate volume still grows with anchor
// density — Integration.integrateEmbeddings(maxAnchorsPerCell = c)
// now thins the correction's searchable anchors to the c
// highest-scored per ε-grid cell (Snn.thinPerGridCell, same rotation
// as the correction search grid), bounding candidate volume at
// O(n·c·3^m) regardless of anchor clustering. This leg runs 16M
// barcodes / 800k real cells (2 samples) through HVG+PCA once, then
// the integration stage twice on the same pca frame:
//   landmark50k           (the 8M leg's variant — the slope reference)
//   landmark50k+cap64     (the new bounded-correction form)
// recording wall + the sampled-kBET mixing fidelity for both.
//
// Run (box otherwise idle, inside tmux):
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 64g \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=256 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/domain_soak_r13.scala
import org.apache.spark.sql.functions._
import spark.implicits._

spark.sparkContext.setLogLevel("WARN")

val nAmbient = sys.env.getOrElse("SOAK_AMBIENT", "7600000").toLong // per sample
val nReal    = sys.env.getOrElse("SOAK_REAL", "400000").toLong     // per sample
val nGenes   = 20000L
val realGenes = 200L

def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"$label%-46s ${(System.nanoTime() - t0) / 1e9}%8.1f s"); r }

// the domain_soak.scala generator verbatim (near-unique real-cell
// profiles; ambient noise barcodes)
def gen(name: String, off: Int, amb: Long, real: Long) = {
  val a = spark.range(amb).select(lit(name).as("sample"), format_string("AMB%08d", col("id")).as("barcode"), explode(sequence(lit(0L), lit(2L))).as("g"), col("id")).select(col("sample"), col("barcode"), format_string("G%05d", pmod(col("id") * 7 + col("g") * 7919 + lit(off), lit(nGenes))).as("gene"), (lit(1L) + pmod(col("id") + col("g"), lit(2L))).as("count"))
  val r = spark.range(real).select(lit(name).as("sample"), format_string("CELL%07d", col("id")).as("barcode"), explode(sequence(lit(0L), lit(realGenes - 1L))).as("g"), col("id")).select(col("sample"), col("barcode"), format_string("G%05d", pmod(pmod(col("id") * 37, lit(7919L)) + col("g") * 3 + lit(off), lit(nGenes))).as("gene"), (lit(5L) + pmod(col("id") * 13 + col("g") * 7, lit(20L))).as("count"))
  a.unionByName(r)
}

def mixingSample(pcaDf: org.apache.spark.sql.DataFrame, cells: org.apache.spark.sql.DataFrame, n: Int = 2000, k: Int = 10): Double = {
  val sample = pcaDf.join(cells.select("cells_id", "sample"), "cells_id").withColumn("h", pmod(xxhash64(lit("kbet_"), col("cells_id")), lit(1000000L))).orderBy("h", "cells_id").limit(n).select("cells_id", "sample", "pc").collect()
  val ids = sample.map(_.getLong(0))
  val grp = sample.map(_.getString(1))
  val pcs = sample.map(_.getSeq[Double](2).toArray)
  def d2(a: Array[Double], b: Array[Double]): Double = { var s = 0.0; var i = 0; while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }; s }
  val scores = ids.indices.map { i =>
    val nn = ids.indices.filter(_ != i).sortBy(j => d2(pcs(i), pcs(j))).take(k)
    nn.count(j => grp(j) == grp(i)).toDouble / k
  }
  scores.sum / scores.size
}

println(s"=== 16M leg: ${2 * (nAmbient + nReal)} barcodes, ${2 * nReal} real cells ===")
val expr = gen("s1", 0, nAmbient, nReal).unionByName(gen("s2", 3, nAmbient, nReal)).repartition(256).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
println(s"rows=${expr.count()}")
val pre = graft.qc.CellQc.minFeatureFilter(expr, 10)
val cellsBase = graft.operators.MergeSamples.withCellsId(pre.select("sample", "barcode").distinct())
val keyed = expr.join(cellsBase.select("sample", "barcode"), Seq("sample", "barcode"), "left_semi")
val red = time("HVG+PCA (shared, uncorrected)") { val r = graft.qc.DataIntegration.run(keyed, cellsBase, numHvg = 1000, numPcs = 30); r.pca.count(); r }
val pcaC = red.pca.localCheckpoint(true)
val groups = cellsBase.select(col("cells_id"), col("sample").as("group"))
println(f"mixing BEFORE correction: ${mixingSample(pcaC, cellsBase)}%.4f")
Seq(("landmark50k", 50000, 0), ("landmark50k+cap64", 50000, 64)).foreach {
  case (vname, m, cap) =>
    val out = time(s"integrateEmbeddings $vname (m=$m cap=$cap)") {
      val o = graft.ml.Integration.integrateEmbeddings(pcaC, groups,
        maxAnchorCells = m, maxAnchorsPerCell = cap)
      o.count(); o
    }
    println(f"mixing AFTER $vname: ${mixingSample(out, cellsBase)}%.4f")
}
expr.unpersist()
System.exit(0)
