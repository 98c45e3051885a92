// Throwaway probe: where does x13 spend time with the native simhash?
import graft.core.Tables
import graft.operators.TextQueries

spark.sparkContext.setLogLevel("ERROR")
val t = Tables(spark, "tmp/sf1")
val df = TextQueries.all.toMap.apply("x13_simhashpairs")(t)
val t0 = System.nanoTime()
df.write.format("noop").mode("overwrite").save()
println(f"WALL ${(System.nanoTime() - t0) / 1e9}%.2f s")
println("=== FINAL PLAN ===")
println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head)
sys.exit(0)
