// Corpus soak, round-8d: 12M docs (2400 bag-identical copies per
// sf0.1 doc) — the leg that CROSSES the x21 driver-route ceiling.
// The member->rep star list is 12M − ~5k edges > the 10M driverLimit,
// so connectedComponents takes the distributed hash-min + pointer-jump
// path for the first time on real fixture duplicity (previously only
// Round5Spec-pinned on synthetic graphs). Claims:
//  - x21 completes on the distributed route and still lands the
//    structural 2,482 clusters (components are determined by the
//    sf0.1 base docs at every duplicity level so far);
//  - x58 survivorship rides that CC at 12M members (keep count =
//    cluster count);
//  - x07's WIDE 8x2 banding and the x30 curation capstone stay
//    branch-linear another 2.4x up from the 5M leg.
//
// Run (box otherwise idle):
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 48g \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=64 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/corpus_soak12m.scala
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.TextQueries

spark.sparkContext.setLogLevel("WARN")

{
  val t = Tables(spark, sys.env.getOrElse("CORPUS_DIR", "/root/repo/tmp/sf240_corpus"))
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    r
  }
  def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  println("docs=" + t.documents.count())

  val cc = time("x21 CC 12M") {
    TextQueries.dupClusters(t)
      .agg(count(lit(1)).as("members"),
        countDistinct("cluster_id").as("clusters")).collect()(0)
  }
  println(s"x21 12M members=${cc.getLong(0)} clusters=${cc.getLong(1)}")

  val keeps = time("x58 survivors 12M") {
    TextQueries.qualitySurvivors(t).filter(col("keep")).count()
  }
  println(s"x58 12M keeps=$keeps")

  val pairs = time("x07 wide 8x2 12M") {
    TextQueries.lshPairs(t, bandRows = 8, numBands = 2).count()
  }
  println(s"x07w 12M verified_pairs=$pairs")

  time("x30 curation 12M") { noop(TextQueries.curationPipeline(t)) }
  println("DONE_12M")
}
sys.exit(0)
