// ANN serving tuning grid, round 13 (r12 verdict item 8): with residual
// (IVFADC) coding landed — and now the build-once default — the
// nprobe × shortlist grid is finally meaningful (raw PQ's 0.00 recall
// floor on clustered fixtures made tuning evidence-free: every setting
// scored 0.00, so no knob mattered). This leg records recall@10 and
// wall per (nprobe ∈ {1,4,16}, shortlist ∈ {0,50,200}) for the
// RESIDUAL index on the two clustered 1M fixtures the r12 grid built:
//  - tmp/sf_ann1m_mog     — 64-component mixture of Gaussians, 64-d
//  - tmp/sf_ann1m_planted — MoG + 10 planted true neighbors per query
// (both deterministic; regenerate via scripts/ann_recall_clustered.scala)
// Output feeds SOAK_ann round-13 and the recommended-defaults note on
// pqQuery.
//
// Run (box otherwise idle, inside tmux):
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=64 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/ann_tuning_r13.scala
import org.apache.spark.sql.functions._
import graft.operators.Similarity

spark.sparkContext.setLogLevel("WARN")

def timed[T](f: => T): (T, Double) = {
  val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
}

// tmp/ is wiped between rounds — regenerate the clustered fixtures with
// the ann_recall_clustered.scala recipes verbatim (deterministic).
val mogDir = "/root/repo/tmp/sf_ann1m_mog"
if (!new java.io.File(mogDir + "/embeddings.parquet").exists()) {
  val (_, w) = timed {
    val K = 64
    val dim = 64
    val centers = spark.range(K).select(col("id").as("c"), transform(sequence(lit(0), lit(dim - 1)), j => (pmod(xxhash64(concat(lit("ctr_"), col("id"), lit("_"), j)), lit(1000000L)).cast("double") / 500000.0 - 1.0)).as("center"))
    spark.range(1000000L).repartition(64).select(col("id").as("vec_id"), pmod(xxhash64(concat(lit("comp_"), col("id"))), lit(K.toLong)).as("c")).join(broadcast(centers), "c").select(col("vec_id"), transform(sequence(lit(0), lit(dim - 1)), j => (element_at(col("center"), j + 1) + (pmod(xxhash64(concat(lit("nz_"), col("vec_id"), lit("_"), j)), lit(1000000L)).cast("double") / 500000.0 - 1.0) * 0.2).cast("float")).as("embedding")).write.mode("overwrite").parquet(mogDir + "/embeddings.parquet")
  }
  println(f"gen MoG fixture: $w%.1f s")
}
val plantedDir = "/root/repo/tmp/sf_ann1m_planted"
if (!new java.io.File(plantedDir + "/embeddings.parquet").exists()) {
  val (_, w) = timed {
    val bg = spark.read.parquet(mogDir + "/embeddings.parquet")
    val qs = bg.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val planted = qs.select(col("qid"), explode(sequence(lit(0), lit(9))).as("j"), col("qe")).select((lit(900000000L) + col("qid") * 10 + col("j")).as("vec_id"), transform(sequence(lit(0), lit(63)), i => (element_at(col("qe"), i + 1) + (pmod(xxhash64(concat(lit("pl_"), col("qid"), lit("_"), col("j"), lit("_"), i)), lit(1000000L)).cast("double") / 500000.0 - 1.0).cast("float") * 0.05f).cast("float")).as("embedding"))
    bg.unionByName(planted).write.mode("overwrite").parquet(plantedDir + "/embeddings.parquet")
  }
  println(f"gen planted fixture: $w%.1f s")
}

def tuningGrid(name: String, dir: String): Unit = {
  println(s"=== fixture: $name ($dir) ===")
  val emb = spark.read.parquet(dir + "/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  println(s"vectors = ${emb.count()}")
  val queries = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("qid"), col("embedding").as("qe"))
  val (exact, exactWall) = timed {
    emb.join(broadcast(queries), emb("vec_id") =!= queries("qid"))
      .select(col("qid"), col("vec_id"),
        Similarity.cosine("embedding", "qe").as("cos"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rk") <= 10).collect()
  }
  println(f"exact top-10 baseline: $exactWall%8.1f s")
  val exactSets = exact.groupBy(_.getLong(0))
    .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
  def recall(rows: Array[org.apache.spark.sql.Row]): Double = {
    val got = rows.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    exactSets.map { case (q, ex) =>
      got.getOrElse(q, Set.empty[Long]).intersect(ex).size / 10.0 }
      .sum / exactSets.size
  }
  val (rpq, buildWall) = timed {
    val i = Similarity.buildPqIndexFrom(emb, nlist = 256, maxTrain = 20480,
      tag = s"tune-$name", residual = true)
    i.codes.count(); i
  }
  println(f"residual index build (nlist=256): $buildWall%8.1f s")
  println(f"${"nprobe"}%8s ${"shortlist"}%10s ${"recall@10"}%10s ${"wall_s"}%8s")
  for (np <- Seq(1, 4, 16); sl <- Seq(0, 50, 200)) {
    val (rows, wall) = timed {
      Similarity.pqQuery(rpq, queries, k = 10, nprobe = np,
        rerankShortlist = sl).collect()
    }
    println(f"$np%8d $sl%10d ${recall(rows)}%10.2f $wall%8.1f")
  }
  rpq.release()
}

tuningGrid("mog", "/root/repo/tmp/sf_ann1m_mog")
tuningGrid("planted", "/root/repo/tmp/sf_ann1m_planted")
System.exit(0)
