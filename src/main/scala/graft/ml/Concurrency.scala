package graft.ml

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Bounded concurrent submission of independent per-sample Spark
  * pipelines. Spark's scheduler interleaves the jobs across the
  * cluster; results come back in INPUT order (not completion order),
  * so downstream output is deterministic. */
object Concurrency {

  def mapSamples[A](samples: Seq[String], maxConcurrent: Int = 8)
                   (f: String => A): Seq[A] = {
    if (samples.lengthCompare(1) <= 0) return samples.map(f)
    val pool = Executors.newFixedThreadPool(math.min(samples.length, maxConcurrent))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(Future.sequence(samples.map(s => Future(f(s)))), Duration.Inf)
    finally pool.shutdown()
  }
}
