// Dump the x21 verification artifacts for the corpus soak
// (SOAK_corpus.md):
//  - at sf1 (50k docs): x13 full pair list + x21 clusters + x23
//    survivorship -> check_cc.py runs its independent union-find over
//    the FULL pair list, verifying the collapsed-edge CC end to end;
//  - at 500k (CC_FULL_PAIRS unset): the full x13 pair list is the
//    quadratic-in-duplicity object itself (2.86e9 banded candidates),
//    so dump the COLLAPSED edges (member->rep + rep-rep, the exact
//    frame dupClusters ran CC over, via TextQueries.dupEdges) + x21 +
//    x23; scripts/check_corpus_cc.py union-finds those edges and
//    compares labels exactly. The collapse itself is the thing the
//    sf1 leg verified against full pairs.
//
//   CORPUS_DIR=... CC_OUT=... [CC_FULL_PAIRS=1] spark-shell ... \
//     -I scripts/corpus_cc_dump.scala
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.TextQueries

spark.sparkContext.setLogLevel("WARN")
val dir = sys.env.getOrElse("CORPUS_DIR", "/root/repo/tmp/sf1")
val out = sys.env.getOrElse("CC_OUT", "/root/repo/tmp/cc_dump")
val t = Tables(spark, dir)

if (sys.env.contains("CC_FULL_PAIRS")) {
  TextQueries.simhashPairs(t).coalesce(1)
    .write.mode("overwrite").parquet(s"$out/x13_simhashpairs")
  println("dumped x13 full pairs")
}
TextQueries.dupEdges(TextQueries.simhashDf(t.documents)).coalesce(1)
  .write.mode("overwrite").parquet(s"$out/x21_edges")
println("dumped collapsed edges")
TextQueries.dupClusters(t).coalesce(1)
  .write.mode("overwrite").parquet(s"$out/x21_dupclusters")
println("dumped x21 clusters")
TextQueries.dedupSurvivors(t).coalesce(1)
  .write.mode("overwrite").parquet(s"$out/x23_dedup_survivors")
println("dumped x23 survivors")
println("cc dump done")
sys.exit(0)
