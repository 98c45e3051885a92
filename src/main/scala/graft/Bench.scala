package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JIT/codegen/session init and first-touch parquet footer
    // reads priced outside the timings — one cheap query per table
    // family (star joins, part regex, lineitem scan, documents text,
    // embeddings vectors, events timestamps)
    // full evaluation via the no-op sink: count() lets Catalyst drop
    // the final sort AND prune aggregate-backed left joins (the right
    // side is provably unique on the join key and contributes no
    // columns to a count), so count-based timings skip real work —
    // measured at sf1: x27 11.2s noop-write vs 0.16s count()
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    Seq("q15_multijoin", "q03_regex", "q01_project", "x02_textstats",
        "x08_cosine_topk", "q31_window").foreach { q =>
      try { run(SparkEntry.queries(q)(spark, sfDir)) }
      catch { case _: Throwable => () }
    }
    // k=3 timed runs per query, report the MEDIAN: single-shot numbers
    // are sub-second-noisy enough to fake 2x regressions on unchanged
    // plans round-over-round; the per-query spread (max-min) is emitted
    // alongside so a wide median is visibly unstable rather than wrong
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        try { run(fn(spark, sfDir)) } catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> (times(times.length / 2), times.last - times.head)
    }
    def json(kv: Seq[(String, Double)]) =
      kv.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = json(results.map { case (k, (med, _)) => k -> med })
    val spread = json(results.map { case (k, (_, sp)) => k -> sp })
    val total = results.map(_._2._1).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","method":"noop_write","queries":$qs,"spread":$spread,"sf":"$sfDir","reps":$reps}""")
    // compact summary LAST: the per-query line above is long enough
    // that a bounded tail capture can truncate its head (and with it
    // the total) — this line restates the headline numbers in a few
    // hundred bytes so they survive any tail window
    val worst = json(results.sortBy(-_._2._1).take(5)
      .map { case (k, (med, _)) => k -> med })
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":${results.length},"worst5":$worst,"sf":"$sfDir","reps":$reps}""")
    spark.stop()
  }
}
