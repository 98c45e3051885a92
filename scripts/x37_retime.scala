// Re-time x37 after the linear sorted-run fix (SOAK_corpus.md 5M leg):
// same harness shape as corpus_soak5m.scala, x37 only, quarter + full.
import graft.core.Tables
import graft.operators.TextQueries

spark.sparkContext.setLogLevel("WARN")
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  r
}
def noop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()

for ((label, dir) <- Seq(
    "x37_fixed_1.25M" -> "/root/repo/tmp/sf25_corpus",
    "x37_fixed_5M" -> "/root/repo/tmp/sf100_corpus")) {
  val t = Tables(spark, dir)
  noop(t.documents.select("doc_id")) // warm footers
  time(label) { noop(TextQueries.gopherRules(t)) }
}
sys.exit(0)
