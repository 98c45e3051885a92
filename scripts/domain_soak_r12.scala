// Domain soak, round 12 (r11 verdict item 5): the sampled-anchor
// ("landmark") integration variant at the 4M-barcode decade, then the
// 8M attempt with it. Round 11 measured integration at 64% of the 4M
// chain wall (950.9 s) with a 1.8x-per-2x-cells slope — the
// k.filter=200 exact-NN anchor search's candidate volume. The r12
// variant (Integration.integrateEmbeddings(maxAnchorCells = m)) runs
// the ANCHOR pipeline on a deterministic ~m-cell value-hash sample per
// group while still correcting EVERY cell; this leg measures its wall
// and fidelity against the exact path at 4M, then attempts 8M.
// Fidelity = the IntegrationSpec mixing statistic (same-batch fraction
// of each cell's 10 exact NN) on a deterministic 2,000-cell sample —
// a sampled kBET; identical sample for both variants.
//
// Run (box otherwise idle, inside tmux):
//   sbt -batch package
//   SOAK_AMBIENT=1900000 SOAK_REAL=100000 SOAK_EIGHT=1 \
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 64g \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=256 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/domain_soak_r12.scala
import org.apache.spark.sql.functions._
import spark.implicits._

spark.sparkContext.setLogLevel("WARN")

val nAmbient = sys.env.getOrElse("SOAK_AMBIENT", "1900000").toLong
val nReal    = sys.env.getOrElse("SOAK_REAL", "100000").toLong
val nGenes   = 20000L
val realGenes = 200L
val runEight = sys.env.getOrElse("SOAK_EIGHT", "1") == "1"

def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"$label%-42s ${(System.nanoTime() - t0) / 1e9}%8.1f s"); r }

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

def leg(label: String, amb: Long, real: Long, variants: Seq[(String, Int)]): Unit = {
  println(s"=== $label: ${2 * (amb + real)} barcodes, ${2 * real} real cells ===")
  val expr = gen("s1", 0, amb, real).unionByName(gen("s2", 3, amb, real)).repartition(128).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  println(s"rows=${expr.count()}")
  val pre = graft.qc.CellQc.minFeatureFilter(expr, 10)
  val cellsBase = graft.operators.MergeSamples.withCellsId(pre.select("sample", "barcode").distinct())
  val keyed = expr.join(cellsBase.select("sample", "barcode"), Seq("sample", "barcode"), "left_semi")
  // uncorrected reductions ONCE; each variant then re-runs ONLY the
  // integration stage on the same pca frame
  val red = time("HVG+PCA (shared, uncorrected)") { val r = graft.qc.DataIntegration.run(keyed, cellsBase, numHvg = 1000, numPcs = 30); r.pca.count(); r }
  val pcaC = red.pca.localCheckpoint(true)
  val groups = cellsBase.select(col("cells_id"), col("sample").as("group"))
  println(f"mixing BEFORE correction: ${mixingSample(pcaC, cellsBase)}%.4f")
  variants.foreach { case (vname, m) =>
    val out = time(s"integrateEmbeddings $vname (m=$m)") { val o = graft.ml.Integration.integrateEmbeddings(pcaC, groups, maxAnchorCells = m); o.count(); o }
    println(f"mixing AFTER $vname: ${mixingSample(out, cellsBase)}%.4f")
  }
  expr.unpersist()
}

// 4M decade: exact (the r11 reference point) vs landmark
leg("4M", nAmbient, nReal, Seq("exact" -> 0, "landmark50k" -> 50000))
// 8M attempt: landmark only (the exact path's 1.8x slope priced it out)
if (runEight) leg("8M", nAmbient * 2, nReal * 2, Seq("landmark50k" -> 50000))
System.exit(0)
