// Throwaway probe: decompose x13 cost at sf1.
import graft.core.Tables
import graft.operators.TextQueries
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

spark.sparkContext.setLogLevel("ERROR")
val t = Tables(spark, "tmp/sf1")

def time(tag: String)(f: => Unit): Unit = {
  val reps = (1 to 3).map { _ =>
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  println(f"PROBE $tag%-26s ${reps.sorted.apply(1)}%.2f s")
}

val sims = TextQueries.simhashDf(t.documents)
time("sims_noop") { sims.write.format("noop").mode("overwrite").save() }

val simsP = sims.persist(StorageLevel.MEMORY_AND_DISK)
simsP.count()
val banded = simsP
  .select(col("doc_id"), col("sim"), explode(array((0 until 4).map(b =>
    struct(lit(b).as("b"),
      (shiftright(col("sim"), b * 15) bitwiseAND lit(0x7fffL)).as("key"))): _*))
    .as("band"))
  .select(col("doc_id"), col("sim"),
    col("band.b").as("b"), col("band.key").as("key"))
time("join_only") {
  banded.as("x").join(banded.as("y"),
    col("x.b") === col("y.b") && col("x.key") === col("y.key") &&
      col("x.doc_id") < col("y.doc_id"))
    .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
    .write.format("noop").mode("overwrite").save()
}
time("join_ham_distinct") {
  banded.as("x").join(banded.as("y"),
    col("x.b") === col("y.b") && col("x.key") === col("y.key") &&
      col("x.doc_id") < col("y.doc_id"))
    .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
      col("x.sim").as("sim1"), col("y.sim").as("sim2"))
    .distinct()
    .select(col("d1"), col("d2"),
      bit_count(col("sim1").bitwiseXOR(col("sim2"))).cast("long").as("ham"))
    .filter(col("ham") <= 6)
    .write.format("noop").mode("overwrite").save()
}
println("PROBE_DONE")
sys.exit(0)
