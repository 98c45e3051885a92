// Round-8d soak: the four newest operators (x51 semantic decon, x52
// contrastive mining, x53 k-center coreset, x54 leakage split) at the
// decade above their gates — 1M vectors / 500k docs, 100-500x sf0.01.
// Claims under test:
//  - x51 is one broadcast-NL pass: wall ~linear in corpus at FIXED
//    bench size (bench chosen per scale so |bench|=100 both legs);
//  - x53 is k narrow passes: wall ~linear in corpus at fixed k=16,
//    radius sequence monotone;
//  - x52's 2-row mining bands are a gate-scale shape: candidate volume
//    vs the 4-row production banding quantified at 50k vs 500k docs
//    (the lshPairs width knob applied to mining);
//  - x54 is groupBy+join flat: wall ~linear, holdout mass ~perMille,
//    and no fingerprint group straddles at 500k.
//
// Run (box otherwise idle):
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/soak_r8d.scala
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Similarity, TextQueries}

spark.sparkContext.setLogLevel("WARN")
val annDir = "/root/repo/tmp/sf_ann"          // 1M vectors
val docDir = "/root/repo/tmp/sf_soak8"        // 500k docs
val annSmall = "/root/repo/tmp/sf_ann_100k"
val docSmall = "/root/repo/tmp/sf_soak8_50k"

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  r
}
def noop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()

// 1/10-scale cuts for growth factors
val tAnn = Tables(spark, annDir)
tAnn.embeddings.filter(col("vec_id") < 100000)
  .write.mode("overwrite").parquet(s"$annSmall/embeddings.parquet")
val tDoc = Tables(spark, docDir)
tDoc.documents.filter(col("doc_id") < 50000)
  .write.mode("overwrite").parquet(s"$docSmall/documents.parquet")
val tAnnS = Tables(spark, annSmall)
val tDocS = Tables(spark, docSmall)
println("vectors=" + tAnn.embeddings.count() + " docs=" + tDoc.documents.count())

// ---- x51: fixed |bench|=100 at both scales --------------------------------
time("x51 decon 100k (bench=100)") {
  noop(Similarity.semDecontaminate(tAnnS, benchMod = 1000, benchRem = 3))
}
time("x51 decon 1M (bench=100)") {
  noop(Similarity.semDecontaminate(tAnn, benchMod = 10000, benchRem = 3))
}

// ---- x53: k=16 at both scales --------------------------------------------
val kc100k = time("x53 kcenter 100k k=16") {
  Similarity.kcenterCoreset(tAnnS, k = 16).collect()
}
val kc1m = time("x53 kcenter 1M k=16") {
  Similarity.kcenterCoreset(tAnn, k = 16).collect()
}
val radii = kc1m.filter(!_.isNullAt(2)).map(_.getDouble(2))
println("x53 radii monotone=" +
  radii.zip(radii.tail).forall { case (a, b) => a >= b } +
  " first=" + radii.head + " last=" + radii.last)

// ---- x52: band-width knob at 50k and 500k --------------------------------
for ((lbl, tt) <- Seq(("50k", tDocS), ("500k", tDoc));
     (bw, rows, bands) <- Seq(("2x8", 2, 8), ("4x4", 4, 4))) {
  val out = time(s"x52 mining $lbl bands=$bw") {
    val r = TextQueries.contrastivePairs(tt, bandRows = rows, numBands = bands)
      .groupBy("pair_type").count().collect()
      .map(x => x.getString(0) + "=" + x.getLong(1)).mkString(" ")
    r
  }
  println(s"  x52 $lbl $bw -> $out")
}

// ---- x54: flat split at 500k ---------------------------------------------
time("x54 split 50k") { noop(TextQueries.leakageSplit(tDocS)) }
val splitAgg = time("x54 split 500k") {
  TextQueries.leakageSplit(tDoc)
    .groupBy("split").agg(count(lit(1)).as("n")).collect()
    .map(r => r.getString(0) -> r.getLong(1)).toMap
}
println("x54 holdout_frac=" +
  splitAgg("holdout").toDouble / splitAgg.values.sum)
// straddle check: any fp with >1 distinct split?
val straddle = TextQueries.leakageSplit(tDoc)
  .groupBy("fp").agg(countDistinct("split").as("ns"))
  .filter(col("ns") > 1).count()
println("x54 straddling_groups=" + straddle)

// cluster-keyed form at 500k (runs the x21 CC underneath)
time("x54 cluster split 500k") {
  noop(TextQueries.leakageSplitByCluster(tDoc))
}
println("SOAK_R8D_DONE")
sys.exit(0)
