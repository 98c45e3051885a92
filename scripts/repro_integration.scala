// Minimal repro of the 1M-barcode integration-stage failure
// (SparkPlan.session()==null NPE inside anchors.count()): same data
// generator and call chain as domain_soak.scala, but skips
// emptyDrops/doublets (which pass) and prints the FULL cause chain
// frame-by-frame (the REPL's default rendering elides the frames that
// identify which nested plan carried the null session).
import org.apache.spark.sql.functions._

val nAmbient = sys.env.getOrElse("SOAK_AMBIENT", "950000").toLong
val nReal    = sys.env.getOrElse("SOAK_REAL", "50000").toLong
val nGenes   = sys.env.getOrElse("SOAK_GENES", "20000").toLong
val realGenes = 200L

def gen(name: String, off: Int) = {
  val amb = spark.range(nAmbient)
    .select(lit(name).as("sample"),
      format_string("AMB%08d", col("id")).as("barcode"),
      explode(sequence(lit(0L), lit(2L))).as("g"), col("id"))
    .select(col("sample"), col("barcode"),
      format_string("G%05d",
        pmod(col("id") * 7 + col("g") * 7919 + lit(off), lit(nGenes))).as("gene"),
      (lit(1L) + pmod(col("id") + col("g"), lit(2L))).as("count"))
  val real = spark.range(nReal)
    .select(lit(name).as("sample"),
      format_string("CELL%07d", col("id")).as("barcode"),
      explode(sequence(lit(0L), lit(realGenes - 1L))).as("g"), col("id"))
    .select(col("sample"), col("barcode"),
      format_string("G%05d",
        pmod(pmod(col("id") * 37, lit(7919L)) + col("g") * 3 + lit(off),
          lit(nGenes))).as("gene"),
      (lit(5L) + pmod(col("id") * 13 + col("g") * 7, lit(20L))).as("count"))
  amb.unionByName(real)
}
val expr = gen("s1", 0).unionByName(gen("s2", 3))
  .repartition(32).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
println(s"rows=${expr.count()} barcodes_per_sample=${nAmbient + nReal}")

val pre = graft.qc.CellQc.minFeatureFilter(expr, 10)
val cellsBase = graft.operators.MergeSamples.withCellsId(
  pre.select("sample", "barcode").distinct())

val t0 = System.nanoTime()
try {
  val r = graft.qc.DataIntegration.runIntegrated(
    expr.join(cellsBase.select("sample", "barcode"),
      Seq("sample", "barcode"), "left_semi"),
    cellsBase, numHvg = 1000, numPcs = 30)
  println(s"INTEGRATION_OK rows=${r.pca.count()} " +
    f"secs=${(System.nanoTime() - t0) / 1e9}%.1f")
} catch {
  case e: Throwable =>
    println("=== REPRO FAILURE: full cause chain ===")
    var c: Throwable = e
    var depth = 0
    while (c != null && depth < 8) {
      println(s"--- [$depth] ${c.getClass.getName}: ${c.getMessage}")
      c.getStackTrace.foreach(f => println(s"    at $f"))
      c = c.getCause
      depth += 1
    }
}
sys.exit(0)
