package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JVM-scoped scratch parquet for iterative operators that must
  * materialize a converged result before returning it (the
  * consume-then-release discipline: returning a persisted plan would pin
  * its storage until the ContextCleaner noticed, long after the caller
  * consumed the result — the r5 q33 bench regression).
  *
  * Lifecycle: ONE root directory per JVM, deleted recursively on exit;
  * within it at most one live flush per `tag` — a new flush for a tag
  * deletes the previous one on entry (by then every caller has
  * materialized the prior result inside its own query), so repeated
  * gate/bench cycles in one JVM hold one flush per operator instead of
  * accumulating a result set per execution. The 100 TB form of a flush
  * is a bucketed/partitioned warehouse table maintained between runs,
  * not a temp directory — this is the single-JVM stand-in.
  */
private[graft] object Scratch {

  private val prevFlush =
    scala.collection.concurrent.TrieMap.empty[String, java.nio.file.Path]

  private def rmTree(p: java.io.File): Unit = {
    Option(p.listFiles()).foreach(_.foreach(rmTree))
    p.delete(): Unit
  }

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft-scratch-")
    sys.addShutdownHook(rmTree(r.toFile))
    r
  }

  /** Write `df` to a fresh scratch parquet for `tag` (dropping the tag's
    * previous flush) and return the written path. The write is an
    * action: the input plan executes exactly once, and every read of the
    * returned path is a plain parquet scan.
    */
  // per-tag flush locks: two threads flushing the SAME tag concurrently
  // must not delete each other's directory mid-write; flushes of
  // different tags stay parallel (the write is the expensive part)
  private val tagLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  def flushPath(s: SparkSession, tag: String, df: DataFrame): String =
    tagLocks.getOrElseUpdate(tag, new Object).synchronized {
      prevFlush.remove(tag).foreach(p => rmTree(p.toFile))
      val dir = java.nio.file.Files.createTempDirectory(root, s"$tag-")
      prevFlush.put(tag, dir)
      val out = dir.resolve("data").toString
      df.write.mode("overwrite").parquet(out)
      out
    }

  /** [[flushPath]], returning the path-backed frame. */
  def flush(s: SparkSession, tag: String, df: DataFrame): DataFrame =
    s.read.parquet(flushPath(s, tag, df))

  /** A per-corpus-dir flush tag: concurrent suites over DIFFERENT dirs
    * must never share (and therefore delete) one tag's directory.
    */
  def dirTag(prefix: String, dir: String): String =
    s"$prefix-${java.lang.Long.toHexString(graft.functions.PolyHash.hash(dir))}"

  /** Register a flushed path as an EXTERNAL parquet catalog table so a
    * SQL-only user can query the memoized store by name
    * (`SELECT … FROM graft_dupgraph_labels_…`) instead of knowing the
    * scratch path. DROP of an external table never deletes the files;
    * the catalog is session-scoped (in-memory), so entries live exactly
    * as long as the scratch itself — nothing dangles across JVMs.
    */
  def register(s: SparkSession, table: String, path: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    s.sql(s"CREATE TABLE $table USING parquet LOCATION '$path'")
    ()
  }
}
