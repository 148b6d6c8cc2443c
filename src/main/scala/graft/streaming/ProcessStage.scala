package graft.streaming

import graft.functions.PolyHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The per-message processing stage (reference T1+T13: bounded-concurrency
  * process with failures captured as data —
  * part2/PekkoStreamGenerator.scala:41-56, recover `:53-55`).
  *
  * In Spark the stage is a projection: the payload row is kept intact and
  * `status`/`error` columns are added — the reference's
  * `ProcessedMessage(result, originalMessage)` wrapper
  * (util/StandardTestTools.scala:28-31) flattened into columns. Stage
  * concurrency (`mapAsyncUnordered(n)`) maps to task parallelism: the
  * number of partitions of the micro-batch bounds in-flight work, set by
  * the source's admission options, not per-operator code.
  *
  * Failure injection (reference F6: `Random.nextInt(10) == 0`,
  * part2/MessageProcessor.scala:58) is deterministic here — a content-hash
  * bucket < failPercent on the FIRST delivery only — so retry tests can
  * assert exact outcomes. `rand(seed) < p` gives the reference's
  * stochastic behavior when wanted.
  */
object ProcessStage {

  val Success = "success"
  val Failure = "failure"

  /** Deterministic failure predicate: fails first deliveries of
    * ~failPercent% of (name, numPublishes) messages; redeliveries succeed.
    */
  def injectedFailure(name: Column, numPublishes: Column, deliveries: Column,
      failPercent: Int): Column =
    deliveries === 0 &&
      pmod(PolyHash(concat(name, lit("#"), numPublishes)), lit(100L)) < failPercent

  /** F7 (reference sleep-work test harness, util/StandardTestTools.scala):
    * simulated per-message service latency for throughput tests. A
    * blocking sleep is the point — it models downstream I/O; concurrency
    * comes from the micro-batch's partitioning (the Spark analogue of the
    * reference's `mapAsyncUnordered(n)` bound). Marked nondeterministic so
    * Catalyst never elides or reorders the side-effecting predicate.
    */
  def withSimulatedService(df: DataFrame, serviceMs: Long): DataFrame = {
    val work = udf { () => Thread.sleep(serviceMs); true }.asNondeterministic()
    df.filter(work())
  }

  /** Adds `status` and `error` columns; all other columns pass through
    * (the "original message" kept for ack routing).
    */
  def withProcessing(df: DataFrame, failPercent: Int): DataFrame = {
    val failed = injectedFailure(
      col("name"), col("numPublishes"), col("deliveries"), failPercent)
    df.withColumn("status", when(failed, Failure).otherwise(Success))
      .withColumn("error",
        when(col("status") === Failure, lit("simulated processing failure"))
          .otherwise(lit(null).cast("string")))
  }
}
