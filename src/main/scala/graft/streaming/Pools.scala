package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** The admission-control mapping for the reference's global permit system
  * (SURVEY §2A P1/P2, part3/PermittedTaskExecutor.scala:41-167) — the
  * survey's single biggest "delete, don't port" item:
  *
  *  - **global permit limit** ≡ total executor cores: Spark's scheduler
  *    runs at most that many concurrent tasks, exactly the cap the permit
  *    queue's `mapAsyncUnordered(globalPermitLimit)` enforced;
  *  - **two-phase submit** (P2's `Future[Future[T]]`) ≡ nothing: the DAG
  *    scheduler queues tasks natively, enqueue never blocks execution;
  *  - **per-workload share** ≡ a FAIR pool per workload (minShare =
  *    guaranteed cores, weight = proportional share);
  *  - **precedence "global first, then per-stream"** (reference
  *    README.md:142-144) holds by construction: pools divide one
  *    cluster-wide core budget.
  *
  * This object makes the mapping concrete: generate the allocation file,
  * configure a session, and pin a query to a pool.
  */
object Pools {

  final case class Pool(name: String, minShare: Int, weight: Int)

  /** Render the fair-scheduler allocation XML. */
  def allocationXml(pools: Seq[Pool]): String = {
    val entries = pools.map { p =>
      s"""  <pool name="${p.name}">
         |    <schedulingMode>FAIR</schedulingMode>
         |    <minShare>${p.minShare}</minShare>
         |    <weight>${p.weight}</weight>
         |  </pool>""".stripMargin
    }.mkString("\n")
    s"<?xml version=\"1.0\"?>\n<allocations>\n$entries\n</allocations>\n"
  }

  /** Write the allocation file and return the configs to set on the
    * session builder (must be set before the SparkContext starts).
    */
  def writeAllocationFile(pools: Seq[Pool], path: String): Map[String, String] = {
    Files.writeString(Paths.get(path), allocationXml(pools))
    Map("spark.scheduler.mode" -> "FAIR", "spark.scheduler.allocation.file" -> path)
  }

  /** Run `body` with its jobs pinned to `pool` (thread-local — exactly
    * where the reference's `mapAsync(1)` submission crossed into the
    * permit queue, T3). Restores the previous pool after.
    */
  def withPool[T](spark: SparkSession, pool: String)(body: => T): T = {
    val key = "spark.scheduler.pool"
    val prev = spark.sparkContext.getLocalProperty(key)
    spark.sparkContext.setLocalProperty(key, pool)
    try body finally spark.sparkContext.setLocalProperty(key, prev)
  }
}
