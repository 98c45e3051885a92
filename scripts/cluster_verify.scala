// Multi-JVM gate run (r10 verdict item 4): local[32] is ONE JVM, so
// task-side serialization defects — driver-held state reachable from
// closures, non-serializable lambdas, broadcast-size surprises — are
// structurally invisible to every local artifact. local-cluster[2,8,4096]
// forks two real executor JVMs: every task closure, broadcast and
// shuffle block crosses a process boundary exactly as on a cluster.
//
// Run (from /root/repo, after `sbt -batch package`):
//   /opt/spark/bin/spark-shell --master local-cluster[2,8,4096] \
//     --driver-memory 8g \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.shuffle.partitions=16 \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS \
//     --conf spark.ui.enabled=false \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/cluster_verify.scala
// then compare like the driver gate does:
//   python3 scripts/check_oracle.py /root/testdata/sf0.01 tmp/cluster_verify
//
// REPL note (SOAK convention): no leading-dot continuation lines —
// spark-shell -I splits them into separate statements.
import java.nio.file.{Files, Paths}

val sfDir = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.01")
val outDir = sys.env.getOrElse("GRAFT_OUT_DIR", "tmp/cluster_verify")
new java.io.File(outDir).mkdirs()

val names = graft.SparkEntry.queries.keys.toSeq.sorted
var failed = List.empty[String]
val t0 = System.nanoTime()
for (name <- names) {
  try {
    graft.SparkEntry.queries(name)(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    println(s"[cluster-verify] ok $name")
  } catch { case e: Throwable =>
    failed = name :: failed
    println(s"[cluster-verify] FAIL $name: ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(400)}")
  }
}

// oracle_sql.json for check_oracle.py — same escaping as graft.Verify
// (trained-state oracles regenerate identically: same data, same seeds)
def jq(s: String): String = "\"" + s.flatMap {
  case '"'  => "\\\""
  case '\\' => "\\\\"
  case '\n' => "\\n"
  case '\r' => "\\r"
  case '\t' => "\\t"
  case c if c < ' ' => f"\\u${c.toInt}%04x"
  case c => c.toString
} + "\""
val json = graft.SparkEntry.oracleSql.map { case (k, v) => s"${jq(k)}: ${jq(v)}" }.mkString("{", ",", "}")
Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

println(f"[cluster-verify] done in ${(System.nanoTime() - t0) / 1e9}%.1f s: ${names.size - failed.size}/${names.size} ok" + (if (failed.nonEmpty) s"; FAILED: ${failed.reverse.mkString(",")}" else ""))
sys.exit(if (failed.nonEmpty) 1 else 0)
