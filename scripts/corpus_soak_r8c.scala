// Corpus-decade soak, round-8 third leg: the five round-8b additions
// (x45 classifier, x46 tfidf, x47 entropy, x48 shards, x49 span
// removal) at 500k docs (10x sf1, 100x the sf0.1 gate) vs sf1, for
// in-session growth factors. Claims under test:
//  - x45 training wall is corpus-size-independent (bounded sample) and
//    scoring is one linear pass;
//  - x46's df join and x49's min-struct first-occurrence stay linear
//    under 10x duplicity (each sf0.1 doc has ~100 shuffled copies —
//    shuffled tokens decorrelate SHINGLES but token sets repeat, so
//    x46 df counts and x47 are the stress; x49's 8-token windows
//    dedup WITHIN copies of one source doc);
//  - x48 is scan + per-shard window at any size.
//
// Run:
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 16g \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=64 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/corpus_soak_r8c.scala
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{QualityQueries, TextQueries}

spark.sparkContext.setLogLevel("WARN")
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  r
}
def noop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()

for ((tag, dir) <- Seq(("sf1/50k", "/root/repo/tmp/sf1"),
                       ("sf10/500k", "/root/repo/tmp/sf10_corpus"))) {
  val t = Tables(spark, dir)
  println(s"== $tag ==")
  time(s"$tag x45_classifier") { noop(QualityQueries.classifierQuality(t)) }
  time(s"$tag x46_tfidf")      { noop(TextQueries.tfidfKeywords(t)) }
  time(s"$tag x47_entropy")    { noop(TextQueries.tokenEntropy(t)) }
  time(s"$tag x48_shards")     { noop(TextQueries.shardAssign(t)) }
  time(s"$tag x49_span_rm")    { noop(TextQueries.spanRemoval(t)) }
}
sys.exit(0)
