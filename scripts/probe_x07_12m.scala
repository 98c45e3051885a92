// x07 wide-banding re-measure at 12M after the row-local shingle
// refactor (r8d measured 725.9 s at p=64 / 356.5 s at p=256, 1,739
// verified pairs). Same fixture, same partitions — the pair count
// must be IDENTICAL (the refactor is value-preserving by spec).
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.TextQueries
spark.sparkContext.setLogLevel("WARN")
val t12 = Tables(spark, "/root/repo/tmp/sf240_corpus")
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  r
}
for (p <- Seq(64, 256)) {
  spark.conf.set("spark.sql.shuffle.partitions", p.toString)
  val n = time(s"x07 wide 8x2 12M p=$p") {
    TextQueries.lshPairs(t12, bandRows = 8, numBands = 2).count()
  }
  println(s"x07 12M p=$p pairs=$n")
}
println("DONE_X07_12M")
sys.exit(0)
