// Throwaway probe: where does the per-row text-scan time go at sf1?
// Times narrow variants over tmp/sf1 documents through the noop sink.
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

spark.sparkContext.setLogLevel("ERROR")
val docs = spark.read.parquet("tmp/sf1/documents.parquet")
docs.persist().count()

def t(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
  val reps = (1 to 3).map { _ =>
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }
  println(f"PROBE $tag%-28s ${reps.sorted.apply(1)}%.2f s")
}

t("baseline_len")(docs.select(col("doc_id"), length(col("text"))))
t("split_only")(docs.select(col("doc_id"), size(split(col("text"), " "))))
t("tokens_hof")(docs.select(col("doc_id"), size(tokens(col("text")))))
t("tokens_plus_distinct")(docs.select(col("doc_id"),
  size(array_distinct(tokens(col("text"))))))
t("quality_full")(docs.withColumn("toks", tokens(col("text")))
  .select(col("doc_id"),
    (least(lit(1.0), size(col("toks")).cast("double") / 100) * 0.5 +
      (size(array_distinct(col("toks"))).cast("double") /
        size(col("toks")).cast("double")) * 0.3 +
      (lit(1.0) - least(lit(1.0),
        length(regexp_replace(col("text"), "[^.,!?;:]", ""))
          .cast("double") / size(col("toks")).cast("double"))) * 0.2)
      .as("q")))
t("simhash_hof")(docs.select(col("doc_id"), simhash60("text")))
t("stopword_langid")(docs.withColumn("toks", tokens(col("text")))
  .select(col("doc_id"),
    graft.operators.TextQueries.langId _ match { case _ => size(col("toks")) }))
println("PROBE_DONE")
sys.exit(0)
