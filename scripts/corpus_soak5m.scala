// Corpus-decade soak, round-8 second leg: 5M docs (10x the 500k leg,
// 1000x the sf1 gate corpus; duplicity g≈1000 bag-identical copies per
// sf0.1 doc — the SimHash twin-group stress another decade up).
// Claims under test:
//  - x21's fingerprint collapse stays linear when the pair-list
//    semantics would be ~2.5e12 candidates (C(1000,2) per twin group);
//    the member->rep star is now ~5M edges, probing the 10M
//    driver-route ceiling from below;
//  - x07's 4x4 gate banding accumulates a quadratic in-bucket tail at
//    this duplicity (measured via the band histogram, not run); the
//    parameterized 8x2 WIDE banding (lshPairs(t, 8, 2)) keeps the
//    candidate volume tractable — the x09 sketch-width move applied
//    to MinHash;
//  - x30 curation, x35 chunk dedup, and the new x37/x39/x40 stay
//    branch-linear another decade up (quarter cut at 1.25M for
//    in-session growth factors).
//
// Run (box otherwise idle, inside tmux):
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 48g \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=64 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/corpus_soak5m.scala
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.TextQueries

spark.sparkContext.setLogLevel("WARN")
val dirFull = sys.env.getOrElse("CORPUS_DIR", "/root/repo/tmp/sf100_corpus")
val dirQuarter = sys.env.getOrElse("CORPUS_QDIR", "/root/repo/tmp/sf25_corpus")

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  r
}
def noop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()

def bandHistogram(label: String, banded: org.apache.spark.sql.DataFrame): Unit =
  time(label) {
    banded.groupBy("b", "key").agg(count(lit(1)).as("n"))
      .agg(max("n").as("max_bucket"), avg("n").as("avg_bucket"),
        sum(when(col("n") > 1, col("n") * (col("n") - 1) / 2).otherwise(0L))
          .as("cand_pairs_ub"))
      .show(false)
  }

def leg(label: String, dir: String, histograms: Boolean): Unit = {
  val t = Tables(spark, dir)
  println(s"=== $label: docs=" + t.documents.count())

  if (histograms) {
    val sig = TextQueries.minhashSignatures(t)
    def mhBands(rows: Int, bands: Int) = sig.select(explode(array(
      (0 until bands).map { b =>
        struct(lit(b).as("b"), concat_ws("_",
          (0 until rows).map(r => col(f"m${b * rows + r}%02d")): _*).as("key"))
      }: _*)).as("band")).select("band.*")
    bandHistogram(s"mh_4x4_histogram", mhBands(4, 4))
    bandHistogram(s"mh_8x2_histogram", mhBands(8, 2))
    val sh = TextQueries.simhashes(t)
    bandHistogram(s"simhash_histogram",
      sh.select(explode(array((0 until 4).map { b =>
        struct(lit(b).as("b"),
          shiftright(col("sim"), b * 15).bitwiseAND(lit(0x7fffL)).as("key"))
      }: _*)).as("band")).select("band.*"))
  }

  // x07 in WIDE banding (8 rows x 2 bands) — the corpus-size knob;
  // 4x4 at this duplicity is the measured-not-run quadratic tail
  val x07w = TextQueries.lshPairs(t, 8, 2).persist()
  time("x07_lsh_wide_8x2") { x07w.count() }
  println("x07 wide verified pairs = " + x07w.count() +
    ", jac>=0.8: " + x07w.filter(col("jac") >= 0.8).count())
  x07w.unpersist()

  val x21 = time("x21_dupclusters") {
    val df = TextQueries.dupClusters(t).persist(); df.count(); df
  }
  println("x21 labeled vertices = " + x21.count() +
    ", clusters = " + x21.filter(col("is_rep")).count())
  x21.unpersist()

  time("x35_chunk_dedup") { noop(TextQueries.chunkDedup(t)) }
  time("x37_gopher_rules") { noop(TextQueries.gopherRules(t)) }
  time("x39_bigram_ppl") { noop(TextQueries.bigramPerplexity(t)) }
  time("x40_ppl_partition") { noop(TextQueries.pplPartition(t)) }

  val x30 = TextQueries.curationPipeline(t).persist()
  time("x30_curation") { x30.count() }
  x30.groupBy("status").count().orderBy("status").show(false)
  x30.unpersist()
  spark.catalog.clearCache()
}

leg("quarter 1.25M", dirQuarter, histograms = false)
leg("full 5M", dirFull, histograms = true)
println("corpus 5M soak done")
sys.exit(0)
