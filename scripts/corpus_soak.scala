// Corpus-decade soak (round 8): the text/dedup pipeline at 500k docs /
// 200k embeddings — 10x the sf1 corpus, 100x the gate's sf0.1.
// The claims under test (VERDICT r7 #2):
//  - x07 MinHash-LSH pairs stay near-linear (shuffled-token copies
//    decorrelate shingles, so no candidate blowup);
//  - x21 SimHash candidate volume IS quadratic-in-duplicity by design
//    (bag-of-tokens copies are ham=0 twins: 100 copies -> C(100,2)
//    pairs per original doc) — the decade pushes the edge count past
//    the 10M driver-union-find limit, forcing the DISTRIBUTED CC path
//    (hash-min + pointer jumping) that sf1 never exercised;
//  - x14 IVF ANN trains on a bounded sample regardless of corpus size;
//  - x30 curation stays branch-linear end-to-end.
// Also records the LSH/SimHash band-bucket distributions (max/avg
// bucket size, candidate-pair upper bound), verified-pair growth vs
// sf1, and the CC convergence — the skew signals a 1000-executor run
// would live or die on.
//
// Run (box otherwise idle, inside tmux — see SOAK_corpus.md):
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 16g \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/corpus_soak.scala
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Similarity, TextQueries}

spark.sparkContext.setLogLevel("WARN")
val dir = sys.env.getOrElse("CORPUS_DIR", "/root/repo/tmp/sf10_corpus")
val t = Tables(spark, dir)
println("docs=" + t.documents.count() + " embeddings=" + t.embeddings.count())

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  r
}
def noop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()

// --- band-bucket distributions (the skew signal), recomputed from the
// public x06/x12 surfaces with the same banding the pair joins use ---
def bandHistogram(label: String, banded: org.apache.spark.sql.DataFrame): Unit =
  time(label) {
    banded.groupBy("b", "key").agg(count(lit(1)).as("n"))
      .agg(max("n").as("max_bucket"), avg("n").as("avg_bucket"),
        sum(when(col("n") > 1, col("n") * (col("n") - 1) / 2).otherwise(0L))
          .as("cand_pairs_ub"))
      .show(false)
  }
val sig = TextQueries.minhashSignatures(t)
val lshBandCols = (0 until 4).map { b =>
  struct(lit(b).as("b"), concat_ws("_",
    (0 until 4).map(r => col(f"m${b * 4 + r}%02d")): _*).as("key"))
}
bandHistogram("lsh_band_histogram",
  sig.select(explode(array(lshBandCols: _*)).as("band")).select("band.*"))
// x13/x21 banding: 4 x 15-bit slices of the 60-bit fingerprint
val sh = TextQueries.simhashes(t)
val shBandCols = (0 until 4).map { b =>
  struct(lit(b).as("b"),
    shiftright(col("sim"), b * 15).bitwiseAND(lit(0x7fffL)).as("key"))
}
bandHistogram("simhash_band_histogram",
  sh.select(explode(array(shBandCols: _*)).as("band")).select("band.*"))

// --- the four soaked pipelines. Each result is persisted and counted
// (materializes every column once); stats then read the cache instead
// of re-running the pipeline. ---
val x07 = TextQueries.lshPairs(t).persist()
time("x07_lshpairs") { x07.count() }
println("x07 verified pairs = " + x07.count() +
  ", jac>=0.8: " + x07.filter(col("jac") >= 0.8).count())
x07.unpersist()

time("x14_ivf_topk") { noop(Similarity.ivfTopK(t)) }

// dupClusters is eager (the CC kernel counts/collects at construction)
// — time the construction AND the materialization
val x21 = time("x21_dupclusters") {
  val df = TextQueries.dupClusters(t).persist(); df.count(); df
}
println("x21 labeled vertices = " + x21.count() +
  ", clusters = " + x21.filter(col("is_rep")).count())
x21.unpersist()

val x30 = TextQueries.curationPipeline(t).persist()
time("x30_curation") { x30.count() }
println("x30 status counts:")
x30.groupBy("status").count().orderBy("status").show(false)
x30.unpersist()

println("corpus soak done")
sys.exit(0)
