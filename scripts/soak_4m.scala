// Fourth domain decade (VERDICT r7 item 7): 4M barcodes/sample — 4x the
// reference's stated 1e6 envelope — run UNTIL THE WALL, with the
// instrumentation needed to document exactly which stage hits it and at
// what size, so a cluster run has a ready reproduction.
// Run via spark-shell --master local[32] --driver-memory <N>g -I
// with spark.sql.extensions=graft.functions.GraftExtensions.
//   SOAK_AMBIENT (default 3,800,000) / SOAK_REAL (200,000) per sample.
// At --driver-memory 12g (the budget every earlier leg used) this is
// expected to fail; the postmortem block prints the failing stage, the
// heap high-water mark, cached-block sizes, and the full cause chain.
// At a larger budget it doubles as the next green decade.
import org.apache.spark.sql.functions._
import spark.implicits._

val nAmbient = sys.env.getOrElse("SOAK_AMBIENT", "3800000").toLong
val nReal    = sys.env.getOrElse("SOAK_REAL", "200000").toLong
val nGenes   = sys.env.getOrElse("SOAK_GENES", "20000").toLong
val realGenes = 200L

val shuffleTotal = new java.util.concurrent.atomic.AtomicLong
val shufflePeak = new java.util.concurrent.atomic.AtomicLong
val spillTotal = new java.util.concurrent.atomic.AtomicLong
spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
  override def onStageCompleted(
      sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
    val m = sc.stageInfo.taskMetrics
    val w = m.shuffleWriteMetrics.bytesWritten
    shuffleTotal.addAndGet(w)
    shufflePeak.getAndUpdate(p => math.max(p, w))
    spillTotal.addAndGet(m.diskBytesSpilled)
  }
})

// Heap high-water mark, polled — peak-per-stage is the number that
// names the wall. MemoryMXBean covers the single local-mode JVM
// (driver + all 32 executor threads share one heap here; on a cluster
// the same plan splits this across executors).
val heapPeak = new java.util.concurrent.atomic.AtomicLong
val mem = java.lang.management.ManagementFactory.getMemoryMXBean
val poller = new Thread(() => {
  while (true) {
    heapPeak.getAndUpdate(p => math.max(p, mem.getHeapMemoryUsage.getUsed))
    Thread.sleep(200)
  }
})
poller.setDaemon(true); poller.start()

def cachedBlocks(label: String): Unit = {
  val infos = spark.sparkContext.getRDDStorageInfo
  val tot = infos.map(i => i.memSize + i.diskSize).sum
  println(f"BLOCKS $label: ${infos.length} cached RDDs, " +
    f"${tot / 1e6}%.0f MB total (mem ${infos.map(_.memSize).sum / 1e6}%.0f," +
    f" disk ${infos.map(_.diskSize).sum / 1e6}%.0f)")
  infos.sortBy(-_.memSize).take(5).foreach { i =>
    println(f"  rdd=${i.id} ${i.name} mem=${i.memSize / 1e6}%.0f MB " +
      f"disk=${i.diskSize / 1e6}%.0f MB parts=${i.numCachedPartitions}/${i.numPartitions}")
  }
}

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
// MEMORY_AND_DISK as in every earlier leg: the COO input itself
// (~102M rows here) is the first candidate for the wall
val expr = gen("s1", 0).unionByName(gen("s2", 3))
  .repartition(64).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
println(s"rows=${expr.count()} barcodes_per_sample=${nAmbient + nReal} genes=$nGenes")
println(f"driver_max_heap=${Runtime.getRuntime.maxMemory / 1e9}%.1f GB")
cachedBlocks("after-generate")

def time[T](label: String)(f: => T): T = {
  val s0 = shuffleTotal.get(); val p0 = spillTotal.get()
  heapPeak.set(mem.getHeapMemoryUsage.getUsed)
  val t0 = System.nanoTime()
  val r = try f catch {
    case e: Throwable =>
      println(s"=== WALL at stage '$label' ===")
      println(f"  heap_peak=${heapPeak.get / 1e9}%.2f GB of " +
        f"${Runtime.getRuntime.maxMemory / 1e9}%.1f GB max")
      println(f"  stage_shuffle=${(shuffleTotal.get - s0) / 1e6}%.0f MB " +
        f"stage_spill=${(spillTotal.get - p0) / 1e6}%.0f MB " +
        f"elapsed=${(System.nanoTime() - t0) / 1e9}%.0f s")
      cachedBlocks(s"$label-postmortem")
      var c: Throwable = e; var depth = 0
      while (c != null && depth < 8) {
        println(s"--- [$depth] ${c.getClass.getName}: ${c.getMessage}")
        c.getStackTrace.take(15).foreach(f => println(s"    at $f"))
        c = c.getCause; depth += 1
      }
      throw e
  }
  val secs = (System.nanoTime() - t0) / 1e9
  println(f"STAGE $label%-12s ${secs}%.1f s  " +
    f"shuffle ${(shuffleTotal.get - s0) / 1e6}%.0f MB  " +
    f"spill ${(spillTotal.get - p0) / 1e6}%.0f MB  " +
    f"heap_peak ${heapPeak.get / 1e9}%.2f GB")
  r
}

val ed = time("emptyDrops") {
  val r = graft.ml.EmptyDrops.run(expr, 100, 500); r.scores.count(); r }
println(s"emptyDrops rows=${ed.scores.count()} flagged=${ed.flagged}")

val pre = graft.qc.CellQc.minFeatureFilter(expr, 10)
val dbl = time("doublets") { val d = graft.ml.Doublets.scores(pre); d.count(); d }
println(s"doublets rows=${dbl.count()}")

val cellsBase = graft.operators.MergeSamples.withCellsId(
  pre.select("sample", "barcode").distinct())
val red = time("integration") {
  val r = graft.qc.DataIntegration.runIntegrated(
    expr.join(cellsBase.select("sample", "barcode"),
      Seq("sample", "barcode"), "left_semi"),
    cellsBase, numHvg = 1000, numPcs = 30)
  r.pca.count(); r
}
println(s"pca rows=${red.pca.count()}")

val emb = time("embedding") {
  graft.qc.ConfigureEmbedding.run(red.pca, numPCs = 20, k = 15, umapEpochs = 50) }
println(s"clusters=${emb.clusters.select("cluster").distinct().count()}")
println(f"SHUFFLE total ${shuffleTotal.get / 1e6}%.0f MB  peak_stage ${shufflePeak.get / 1e6}%.0f MB  spill ${spillTotal.get / 1e6}%.0f MB")
println("SOAK_4M_DONE")
sys.exit(0)
