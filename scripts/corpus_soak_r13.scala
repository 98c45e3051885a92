// Corpus-decade soak, round 13 (r12 verdict item 6): the 24M-doc leg.
// The curation family's discipline — every decade so far surfaced a
// defect (r8: plain-form scratch exhaustion; r9: staged ordering; r10:
// staged 24 g OOM; r11: the td storage-squatter diagnosis) — says run
// the next decade. 24M docs = 4800 bag-identical token-shuffled copies
// per sf0.1 doc (the standing recipe from corpus_soak_r9.scala, kept
// formula-identical for reproducibility).
//
// Disk budget drives the shape: the box has ~80 GB free; the 12M
// staged leg peaked ~45 GB used (min free 32.3 of ~77) INCLUDING the
// 12M output parquet. At 24M the staged scratch extrapolates to
// ~56 GB and the plain form's ~40 GB @ 12M to ~80 GB — plain cannot
// fit, so this leg runs the STAGED form only (the r12 verdict
// sanctions exactly this: "if the box can't hold 24M, run the staged
// form"). The status distribution is aggregated directly from the
// pipeline output (one extra shuffle over the noop write, no 24M
// parquet on disk).
//
// Partitions: p=512 keeps the decontamination stage's per-task
// explode→partial-agg map volume at the 12M/p256 level (~36M entries/
// task was the r11 OOM mechanism; doubling docs and partitions
// together holds it flat). Driver stays 24 g — the r11 claim under
// test is that the DISK_ONLY td + checkpoint schedule gives the full
// unified pool to execution regardless of corpus size.
//
// Also at 24M: x42 build-once index + two delta batches (proven at
// 12M; the O(delta+matches) claim should hold at any corpus size
// because batch cost never touches the standing corpus), and x21
// connected components (24M − ~5k edges, 2.4× past the 10M
// driverLimit — deeper into the distributed hash-min route).
//
// Run (box otherwise idle, inside tmux):
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=512 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/corpus_soak_r13.scala
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.TextQueries

spark.sparkContext.setLogLevel("WARN")

{
  val dir24m = "/root/repo/tmp/sf480_corpus"
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    r
  }

  // the corpus_soak_r9.scala generator, g=4800 (formula kept as-built,
  // including the no-pos hash quirk documented there)
  def gen(dir: String, g: Int): Unit =
    if (!new java.io.File(dir + "/documents.parquet").exists()) {
      time(s"gen $dir (g=$g)") {
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
          .select(col("doc_id").as("base_id"), col("text"),
            col("source"), col("lang"))
          .withColumn("copy", explode(sequence(lit(0), lit(g - 1))))
          .repartition(128)
          .select(
            (col("base_id") * g + col("copy")).as("doc_id"),
            array_join(transform(
              array_sort(transform(
                filter(split(col("text"), "\\s+"), t => t =!= ""),
                t => struct(xxhash64(t, col("copy"), col("base_id")).as("h"),
                  t.as("t")))),
              s => s("t")), " ").as("text"),
            col("lang"), col("source"),
            length(col("text")).cast("long").as("n_chars"))
          .write.mode("overwrite").parquet(dir + "/documents.parquet")
      }
    }
  gen(dir24m, 4800)
  val t24 = Tables(spark, dir24m)
  println("docs24m=" + t24.documents.count())

  val minFree = new java.util.concurrent.atomic.AtomicLong(Long.MaxValue)
  val mon = new Thread(() => while (true) {
    val f = new java.io.File("/tmp").getUsableSpace
    minFree.getAndAccumulate(f, (a: Long, b: Long) => math.min(a, b))
    Thread.sleep(2000)
  })
  mon.setDaemon(true); mon.start()
  def legScratch(label: String): Unit = {
    val end = new java.io.File("/tmp").getUsableSpace
    println(f"$label scratch: min free ${minFree.get() / 1e9}%.1f GB during leg, ${end / 1e9}%.1f GB free at leg end")
    minFree.set(Long.MaxValue)
  }

  // ---- leg 1: x21 CC at 24M (distributed route, 2.4x driverLimit) ------
  val cc = time("x21 CC 24M") {
    TextQueries.dupClusters(t24)
      .agg(count(lit(1)).as("members"),
        countDistinct("cluster_id").as("clusters")).collect()(0)
  }
  println(s"x21 24M members=${cc.getLong(0)} clusters=${cc.getLong(1)}")
  legScratch("x21 24M")

  // ---- leg 2: x30 STAGED at 24M, p512, 24 g ----------------------------
  val statuses = time("x30 STAGED 24M p512 24g") {
    TextQueries.curationPipelineStaged(t24)
      .groupBy("status").count().orderBy("status").collect()
  }
  statuses.foreach(r => println(s"status ${r.getString(0)} = ${r.getLong(1)}"))
  legScratch("x30 staged 24M")
  println("X30_24M_STAGED_DONE")

  // ---- leg 3: x42 build-once, 2 batches at 24M --------------------------
  val docs24 = t24.documents
  val corpus = docs24.filter(col("doc_id") % 10 =!= 0)
  val b1 = docs24.filter(col("doc_id") % 20 === 0)
  val b2 = docs24.filter(col("doc_id") % 20 === 10)
  val idx = time("x42 buildDedupIndex 21.6M") {
    val i = TextQueries.buildDedupIndex(corpus)
    i.fp.count(); i.bands.count()
    i
  }
  legScratch("x42 build 21.6M")
  val s1 = time("x42 batch1 query 1.2M") {
    TextQueries.deltaDedupAgainst(idx, b1).groupBy("status").count().collect()
  }
  println("x42 b1: " + s1.map(r => r.getString(0) + "=" + r.getLong(1)).sorted.mkString(" "))
  val idx2 = time("x42 absorbDelta 1.2M") {
    val i = TextQueries.absorbDelta(idx, b1)
    i.fp.count(); i.bands.count()
    i
  }
  val s2 = time("x42 batch2 query 1.2M") {
    TextQueries.deltaDedupAgainst(idx2, b2).groupBy("status").count().collect()
  }
  println("x42 b2: " + s2.map(r => r.getString(0) + "=" + r.getLong(1)).sorted.mkString(" "))
  idx2.release(); idx.release()
  legScratch("x42 batches 24M")
  println("DONE_24M")
}
sys.exit(0)
