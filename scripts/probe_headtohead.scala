// Throwaway probe: old (explode+agg) vs new (native+persist) simhash
// pairs formulations, same session, alternating reps.
import graft.core.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

spark.sparkContext.setLogLevel("ERROR")
val t = Tables(spark, "tmp/sf1")

def oldSims(docs: DataFrame): DataFrame = {
  val toksDf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tk"))
  val h = toksDf.select(col("doc_id"), hash60(col("tk")).as("h"))
  val aggs = (0 until 60).map(b =>
    sum(shiftright(col("h"), b).bitwiseAND(lit(1L))).as(s"s$b")) :+
    count(lit(1)).as("n")
  val bits = h.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  val sim = (0 until 60).map(b =>
    when(col(s"s$b") * 2 >= col("n"), lit(1L << b)).otherwise(lit(0L)))
    .reduce(_ + _)
  docs.select("doc_id").join(bits, Seq("doc_id"), "left")
    .select(col("doc_id"),
      when(col("n").isNull, lit((1L << 60) - 1)).otherwise(sim).as("sim"))
}

def pairsFrom(sims: DataFrame): DataFrame = {
  val banded = sims
    .select(col("doc_id"), col("sim"), explode(array((0 until 4).map(b =>
      struct(lit(b).as("b"),
        (shiftright(col("sim"), b * 15) bitwiseAND lit(0x7fffL)).as("key"))): _*))
      .as("band"))
    .select(col("doc_id"), col("sim"),
      col("band.b").as("b"), col("band.key").as("key"))
  val x = banded.select(col("doc_id").as("d1"), col("sim").as("sim1"),
    col("b").as("jb"), col("key").as("jkey"))
  val y = banded.select(col("doc_id").as("d2"), col("sim").as("sim2"),
    col("b").as("jb"), col("key").as("jkey"))
  x.join(y, Seq("jb", "jkey")).filter(col("d1") < col("d2"))
    .select(col("d1"), col("d2"), col("sim1"), col("sim2"))
    .distinct()
    .select(col("d1"), col("d2"),
      bit_count(col("sim1").bitwiseXOR(col("sim2"))).cast("long").as("ham"))
    .filter(col("ham") <= 6)
}

def time(tag: String, reps: Int = 3)(f: => Unit): Unit = {
  val rs = (1 to reps).map { _ =>
    spark.catalog.clearCache()
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  println(f"PROBE $tag%-14s ${rs.sorted.apply(reps / 2)}%.2f s  (all: ${rs.map(r => f"$r%.2f").mkString(", ")})")
}

time("old_agg") {
  pairsFrom(oldSims(t.documents)).orderBy("d1", "d2")
    .write.format("noop").mode("overwrite").save()
}
time("new_persist") {
  val sims = graft.operators.TextQueries.simhashDf(t.documents)
    .repartition(col("doc_id")).persist(StorageLevel.MEMORY_AND_DISK)
  pairsFrom(sims).orderBy("d1", "d2")
    .write.format("noop").mode("overwrite").save()
}
time("new_repart") {
  val sims = graft.operators.TextQueries.simhashDf(t.documents)
    .repartition(col("doc_id"))
  pairsFrom(sims).orderBy("d1", "d2")
    .write.format("noop").mode("overwrite").save()
}
println("PROBE_DONE")
sys.exit(0)
