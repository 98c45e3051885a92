// Models soak, round 11: the fit-once artifacts (LmModel, DsirModel,
// classifier weights) and x63 mixture materialization at the 12M-doc
// decade — every new operator runs at its scale decade (the repo
// discipline; every decade so far has found a defect). Claims:
//  - buildLmModel cost is ONE pass over the in-domain slice (~600k
//    docs here), and lmScore over the remaining ~11.4M is the same
//    shape as the per-call x39 gate minus the refit — so a second
//    scoring batch pays scoring only;
//  - the LM/DSIR model tables stay corpus-size-independent (≤1024² /
//    ≤4096 rows) and broadcast — no shuffle grows with the model;
//  - classifier training stays bounded (≤20k-doc sample) while
//    scoring scans 12M once;
//  - x63 emits ~Σ boost·|src| rows in one linear pass — the explode
//    does not amplify beyond the declared epoch factor.
// Fixture: tmp/sf240_corpus (gen_sf1.py, 2400 token-shuffled copies of
// sf0.1's 5000 docs = 12M docs, sources src0..src19 preserved).
//
// Run (box otherwise idle, inside tmux):
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=256 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/models_soak_12m.scala
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.TextQueries
import graft.ml.QualityClassifier

spark.sparkContext.setLogLevel("WARN")
spark.conf.set("spark.sql.shuffle.partitions", "256")

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"$label%-38s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  r
}
def noop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()

val t = Tables(spark, "/root/repo/tmp/sf240_corpus")
println("docs=" + t.documents.count())
val docs = t.documents

// --- fit-once bigram LM ---
var lm: TextQueries.LmModel = null
time("buildLmModel_src0_600k") { lm = TextQueries.buildLmModel(docs.filter(col("source") === "src0")) }
println("lm ctx rows=" + lm.ctx.count() + " mdl rows=" + lm.mdl.count())
time("lmScore_rest_11M4") { noop(TextQueries.lmScore(lm, docs.filter(col("source") =!= "src0"))) }
// a second batch pays scoring only — no refit
time("lmScore_batch2_src1_600k") { noop(TextQueries.lmScore(lm, docs.filter(col("source") === "src1"))) }
lm.release()

// per-call gate form for comparison (fit + score + release inside)
time("x39_gate_percall_12m") { noop(TextQueries.bigramPerplexity(t)) }

// --- fit-once DSIR ---
var dsir: TextQueries.DsirModel = null
time("buildDsirModel_12m") { dsir = TextQueries.buildDsirModel(docs.filter(col("source") === "src0"), docs.filter(col("source") =!= "src0")) }
println("dsir lr rows=" + dsir.lr.count())
time("dsirScore_rest_11M4") { noop(TextQueries.dsirScore(dsir, docs.filter(col("source") =!= "src0"))) }
dsir.release()
time("x36_gate_percall_12m") { noop(TextQueries.dsirWeights(t)) }

// --- classifier: bounded train, 12M score ---
var qm: QualityClassifier.Model = null
time("classifier_train_bounded") { qm = QualityClassifier.train(docs, col("source") === "src0") }
time("classifier_score_12m") { noop(QualityClassifier.score(docs, qm)) }

// --- x63 at 12M ---
var rows = 0L
time("x63_mixture_materialize_12m") { rows = TextQueries.mixtureMaterialize(t).count() }
println("x63 output rows=" + rows + " (12M in; Σ boost·|src| expected ≈ 12M for near-uniform sources)")

sys.exit(0)
