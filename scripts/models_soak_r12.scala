// Models soak, round 12: x64 sequence packing at the 12M-doc decade —
// the one round-11 operator without a scale-decade leg (r11 verdict
// item 4; every decade so far has found a defect — look for one).
// Claims under test:
//  - wall scales like one narrow pass + a PER-SHARD window (the shard
//    key is what removes global-order serialization) + a row-local
//    explode: nothing corpus-global;
//  - token conservation holds at the decade: per-doc sum(tok_in_seq)
//    == n_tok for every doc, and the global sums agree;
//  - every sequence is full (== seqLen) except at most one tail per
//    shard;
//  - the window's peak partition (docs per shard) stays ~|docs|/nShards
//    — the knob a 100 TB run scales with the corpus.
// Fixture: tmp/sf240_corpus (gen recipe from corpus_soak_r9.scala —
// 2400 token-shuffled copies per sf0.1 doc = 12M docs), regenerated
// here if absent.
//
// Run (box otherwise idle, inside tmux):
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=256 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/models_soak_r12.scala
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.TextQueries

spark.sparkContext.setLogLevel("WARN")

def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%8.1f s"); r }

val dir12m = "/root/repo/tmp/sf240_corpus"
if (!new java.io.File(dir12m + "/documents.parquet").exists()) {
  time(s"gen $dir12m (g=2400)") {
    spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id").as("base_id"), col("text"), col("source"), col("lang")).withColumn("copy", explode(sequence(lit(0), lit(2399)))).repartition(64).select((col("base_id") * 2400 + col("copy")).as("doc_id"), array_join(transform(array_sort(transform(filter(split(col("text"), "\\s+"), t => t =!= ""), t => struct(xxhash64(t, col("copy"), col("base_id")).as("h"), t.as("t")))), s => s("t")), " ").as("text"), col("lang"), col("source"), length(col("text")).cast("long").as("n_chars")).write.mode("overwrite").parquet(dir12m + "/documents.parquet")
  }
}

val t12 = Tables(spark, dir12m)
val nDocs = time("count docs")(t12.documents.count())
println(s"docs = $nDocs")

// production shape: seqLen=2048 (a training context window), shards
// scaled so each shard holds ~50k docs
val shards = 256
val packed = TextQueries.sequencePack(t12, seqLen = 2048, nShards = shards)
val packedRows = time(s"x64 sequencePack 12M (seqLen=2048, nShards=$shards)") { packed.write.format("noop").mode("overwrite").save(); packed.count() }
println(s"packed rows = $packedRows")

// gate shape one decade up (seqLen=64 — many more chunk rows/doc)
val packed64 = TextQueries.sequencePack(t12, seqLen = 64, nShards = shards)
time("x64 sequencePack 12M (seqLen=64)") { packed64.write.format("noop").mode("overwrite").save() }

// token conservation at the decade: per-doc span sum == n_tok, zero
// mismatching docs (the join is one shuffle over (doc_id, n_tok) pairs)
val nTok = t12.documents.select(col("doc_id"), size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n_tok")).filter(col("n_tok") > 0)
val mismatch = time("conservation check (per-doc join)") {
  packed.groupBy("doc_id").agg(sum("tok_in_seq").as("packed_tok")).join(nTok, "doc_id").filter(col("packed_tok") =!= col("n_tok")).count()
}
println(s"conservation mismatches = $mismatch (MUST be 0)")

// full-sequence invariant: every (shard, seq_id) holds exactly seqLen
// tokens except at most one tail per shard
val short = time("full-sequence invariant") {
  packed.groupBy("shard", "seq_id").agg(sum("tok_in_seq").as("n")).filter(col("n") =!= 2048).groupBy("shard").count().filter(col("count") > 1).count()
}
println(s"shards with >1 non-full sequence = $short (MUST be 0)")

// window peak partition: docs per shard (the state the per-shard
// cumsum sort actually holds)
val shardSizes = nTok.withColumn("shuf", graft.functions.TextFunctions.hash60(concat(lit("pack_"), col("doc_id").cast("string")))).groupBy(pmod(col("shuf"), lit(shards.toLong))).count().agg(min("count"), max("count"), avg("count")).collect()(0)
println(s"docs per shard: min=${shardSizes.get(0)} max=${shardSizes.get(1)} avg=${shardSizes.get(2)}")
System.exit(0)
