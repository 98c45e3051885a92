// Throwaway probe: simhash-family timings at sf1 with the native expr.
import graft.core.Tables
import graft.operators.TextQueries

spark.sparkContext.setLogLevel("ERROR")
val t = Tables(spark, "tmp/sf1")

def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
  val reps = (1 to 3).map { _ =>
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }
  println(f"PROBE $tag%-22s ${reps.sorted.apply(1)}%.2f s")
}

time("x12_simhash")(TextQueries.all.toMap.apply("x12_simhash")(t))
time("x13_simhashpairs")(TextQueries.all.toMap.apply("x13_simhashpairs")(t))
time("x21_dupclusters")(TextQueries.all.toMap.apply("x21_dupclusters")(t))
time("x23_dedup_survivors")(TextQueries.all.toMap.apply("x23_dedup_survivors")(t))
println("PROBE_DONE")
sys.exit(0)
