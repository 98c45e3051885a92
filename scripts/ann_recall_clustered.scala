// PQ recall grid on a CLUSTERED 1M fixture, round 12 (r11 verdict item
// 7): the honest recall table so far (ADC 0.00–0.02, +re-rank
// 0.11–0.22) was measured ONLY on i.i.d.-uniform vectors — PQ's
// pathological worst case (top-10 cosine margins below the 4-bit
// quantization noise), which systematically understates production
// behavior and leaves nprobe/shortlist tuning evidence-free. This leg
// runs the SAME grid code on two 1M fixtures side by side:
//  - tmp/sf_ann          — i.i.d. uniform (gen_sf1.py, 500 rotation+
//    sign-flip copies of sf0.1's 2000 vectors); regenerate first with
//    `python3 scripts/gen_sf1.py /root/testdata/sf0.1 /root/repo/tmp/sf_ann 500 embeddings`
//  - tmp/sf_ann1m_mog    — mixture of 64 Gaussians in 64-d, generated
//    here deterministically (xxhash64-derived centers and noise,
//    sigma=0.2 per coordinate against unit-cube centers), the shape a
//    real embedding corpus has: within-cluster cosines well above the
//    quantization floor.
// Grid per fixture: exact top-10 baseline, PQ-ADC at nprobe 8/32,
// ADC+exact re-rank (shortlist=400, nprobe=32), IVF exact scoring
// (nprobe=16). recall@10 = mean |top10 ∩ exact-top10| / 10 over the
// 10 query vectors (vec_id < 10, self excluded).
//
// Run (box otherwise idle, inside tmux):
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=64 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/ann_recall_clustered.scala
import org.apache.spark.sql.functions._
import graft.operators.Similarity

spark.sparkContext.setLogLevel("WARN")

def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"$label%-46s ${(System.nanoTime() - t0) / 1e9}%8.1f s"); r }

val mogDir = "/root/repo/tmp/sf_ann1m_mog"
if (!new java.io.File(mogDir + "/embeddings.parquet").exists()) {
  time("gen MoG fixture (1M x 64-d, 64 components)") {
    val K = 64
    val dim = 64
    val centers = spark.range(K).select(col("id").as("c"), transform(sequence(lit(0), lit(dim - 1)), j => (pmod(xxhash64(concat(lit("ctr_"), col("id"), lit("_"), j)), lit(1000000L)).cast("double") / 500000.0 - 1.0)).as("center"))
    spark.range(1000000L).repartition(64).select(col("id").as("vec_id"), pmod(xxhash64(concat(lit("comp_"), col("id"))), lit(K.toLong)).as("c")).join(broadcast(centers), "c").select(col("vec_id"), transform(sequence(lit(0), lit(dim - 1)), j => (element_at(col("center"), j + 1) + (pmod(xxhash64(concat(lit("nz_"), col("vec_id"), lit("_"), j)), lit(1000000L)).cast("double") / 500000.0 - 1.0) * 0.2).cast("float")).as("embedding")).write.mode("overwrite").parquet(mogDir + "/embeddings.parquet")
  }
}

def recallGrid(name: String, dir: String): Unit = {
  println(s"=== fixture: $name ($dir) ===")
  val emb = spark.read.parquet(dir + "/embeddings.parquet").select(col("vec_id"), col("embedding"))
  println(s"vectors = ${emb.count()}")
  val queries = emb.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding").as("qe"))
  // exact top-10 baseline: broadcast the 10 queries onto one corpus scan
  val exact = time("exact top-10 baseline") {
    emb.join(broadcast(queries), emb("vec_id") =!= queries("qid")).select(col("qid"), col("vec_id"), Similarity.cosine("embedding", "qe").as("cos")).withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id")))).filter(col("rk") <= 10).collect()
  }
  val exactSets = exact.groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
  def recall(rows: Array[org.apache.spark.sql.Row]): Double = {
    val got = rows.groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    exactSets.map { case (q, ex) => got.getOrElse(q, Set.empty[Long]).intersect(ex).size / 10.0 }.sum / exactSets.size
  }
  val pq = time("buildPqIndex (nlist=256, maxTrain=20480)") { val i = Similarity.buildPqIndexFrom(emb, nlist = 256, maxTrain = 20480, tag = s"recall-$name"); i.codes.count(); i }
  val adc8 = time("PQ-ADC nprobe=8") { Similarity.pqQuery(pq, queries, k = 10, nprobe = 8).collect() }
  val adc32 = time("PQ-ADC nprobe=32") { Similarity.pqQuery(pq, queries, k = 10, nprobe = 32).collect() }
  val rr = time("ADC + exact re-rank (shortlist=400, nprobe=32)") { Similarity.pqQuery(pq, queries, k = 10, nprobe = 32, rerankShortlist = 400).collect() }
  val ivf = time("buildIvfIndex + exact scoring nprobe=16") { val i = Similarity.buildIvfIndexFrom(emb, nlist = 256, maxTrain = 20480, tag = s"recall-ivf-$name"); i.assigned.count(); val r = Similarity.ivfQuery(i, queries, k = 10, nprobe = 16).collect(); i.release(); r }
  pq.release()
  // r12 residual form (faiss IVFADC): codes the residual from the
  // coarse centroid — the within-cell information raw coding wastes
  val rpq = time("buildPqIndex RESIDUAL") { val i = Similarity.buildPqIndexFrom(emb, nlist = 256, maxTrain = 20480, tag = s"recall-res-$name", residual = true); i.codes.count(); i }
  val radc8 = time("residual ADC nprobe=8") { Similarity.pqQuery(rpq, queries, k = 10, nprobe = 8).collect() }
  val radc32 = time("residual ADC nprobe=32") { Similarity.pqQuery(rpq, queries, k = 10, nprobe = 32).collect() }
  val rrr = time("residual ADC + re-rank (400, np=32)") { Similarity.pqQuery(rpq, queries, k = 10, nprobe = 32, rerankShortlist = 400).collect() }
  rpq.release()
  println(f"recall@10 $name: ADC np8=${recall(adc8)}%.2f ADC np32=${recall(adc32)}%.2f rerank=${recall(rr)}%.2f IVF-exact np16=${recall(ivf)}%.2f | RESIDUAL ADC np8=${recall(radc8)}%.2f np32=${recall(radc32)}%.2f rerank=${recall(rrr)}%.2f")
}

// third fixture: the RETRIEVAL margin structure — the MoG background
// plus 10 PLANTED true neighbors per query at cosine ~0.999 (query +
// U(-0.05,0.05)^64 perturbation; cluster background pairs sit ~0.96).
// iid and tight-MoG both put the true top-10 margins BELOW the 32-bit
// quantization noise (that is what their recalls measure); a retrieval
// corpus's true matches are high-margin, and this fixture measures
// whether PQ preserves THAT.
val plantedDir = "/root/repo/tmp/sf_ann1m_planted"
if (!new java.io.File(plantedDir + "/embeddings.parquet").exists()) {
  time("gen planted fixture (MoG + 10 planted NN/query)") {
    val bg = spark.read.parquet(mogDir + "/embeddings.parquet")
    val qs = bg.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val planted = qs.select(col("qid"), explode(sequence(lit(0), lit(9))).as("j"), col("qe")).select((lit(900000000L) + col("qid") * 10 + col("j")).as("vec_id"), transform(sequence(lit(0), lit(63)), i => (element_at(col("qe"), i + 1) + (pmod(xxhash64(concat(lit("pl_"), col("qid"), lit("_"), col("j"), lit("_"), i)), lit(1000000L)).cast("double") / 500000.0 - 1.0).cast("float") * 0.05f).cast("float")).as("embedding"))
    bg.unionByName(planted).write.mode("overwrite").parquet(plantedDir + "/embeddings.parquet")
  }
}

recallGrid("iid", "/root/repo/tmp/sf_ann")
recallGrid("mog", mogDir)
recallGrid("planted", plantedDir)
System.exit(0)
