package graft

import graft.core.Tables
import graft.operators.{Bpe, QualityQueries, Similarity, StarQueries, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-name → (session, sfDir) → result DataFrame;
  * `oracleSql` holds the DuckDB-equivalent SQL for every oracle-checkable
  * entry (same column names — the driver hashes column-sorted values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the Q15 star join
    * (multi-way equi join + decimal agg). Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StarQueries.q15(Tables(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator: the §2.10 gate set plus the
    * training-data-pipeline extensions (dedup / similarity / text). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (StarQueries.all ++ TextQueries.all ++ Similarity.all ++ Bpe.all ++
      QualityQueries.all).map {
      case (name, fn) =>
        name -> ((s: SparkSession, dir: String) => fn(Tables(s, dir)))
    }.toMap

  /** DuckDB oracle per oracle-checkable query (SURVEY §2.10 dialect
    * adapter). Keys absent here get the driver's rows-only check. */
  def oracleSql: Map[String, String] =
    StarQueries.oracles ++ TextQueries.oracles ++ Similarity.oracles ++
      Bpe.oracles ++ QualityQueries.oracles
}
