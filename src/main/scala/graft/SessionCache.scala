package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Session-scoped memoization shared by the table readers
  * ([[graft.sources.Tables]]) and the expensive multi-consumer pipelines
  * (TextQueries.dedupClusters). One JVM can host many SparkSessions over its
  * lifetime (every ScalaTest suite, Verify run and Bench run builds one), so
  * entries are keyed by `applicationId + startTime` — a pair that is never
  * reused, unlike an identity hash after GC — and any cache MISS sweeps
  * entries whose owning context has stopped, so stale values (in particular
  * lazily-checkpointed DataFrames from dead sessions) cannot accumulate for
  * the JVM lifetime on a multi-session host.
  *
  * Cache-coherence contract: values are keyed by a caller-chosen tag that
  * embeds the source directory; the test datasets are immutable per path
  * (a mutable corpus would key on a snapshot/version id instead).
  *
  * Builds are NOT locked: concurrent misses may build twice, but every
  * cached value in this engine is deterministic by construction, so
  * last-put-wins is byte-identical to the first build. That keeps the
  * common hit path a single lock-free map read.
  */
object SessionCache {
  private final case class Entry(session: SparkSession, value: AnyRef)

  private val map = new ConcurrentHashMap[(String, String), Entry]()

  private def sessionKey(s: SparkSession): String =
    s.sparkContext.applicationId + "/" + s.sparkContext.startTime

  /** The memoized value for (session, tag), building (and sweeping dead
    * sessions' entries) on miss. A hit whose owning context has since been
    * stopped is rebuilt rather than handed out as a dead reference. */
  def getOrBuild[T <: AnyRef](s: SparkSession, tag: String)(build: => T): T = {
    val key = (sessionKey(s), tag)
    val hit = map.get(key)
    if (hit != null && !hit.session.sparkContext.isStopped)
      hit.value.asInstanceOf[T]
    else {
      val it = map.entrySet().iterator()
      while (it.hasNext)
        if (it.next().getValue.session.sparkContext.isStopped) it.remove()
      val v = build
      map.put(key, Entry(s, v))
      v
    }
  }

  /** Visible for tests: current number of live entries. */
  private[graft] def size: Int = map.size()

  private val pins = new java.util.concurrent.ConcurrentLinkedQueue[Entry]()

  /** Pins `value` for the lifetime of `s` (swept when the context stops).
    *
    * Used by [[lazyLocalCheckpoint]] to keep a checkpointed plan's
    * driver-side SQLMetric accumulators strongly reachable: Spark's
    * accumulator registry holds only WEAK references, and a lazy local
    * checkpoint drops its own strong ones when the first consumer's job
    * truncates the lineage (`markCheckpointed` nulls the closures mid-way
    * through that consumer's multi-job AQE execution). Any task-completion
    * event still in flight then logs `ERROR DAGScheduler: ... attempted to
    * access non-existent accumulator` once GC has collected the metrics —
    * reproduced 125× on q122 with a 3 GiB driver heap, gone with the pin.
    * The updates land in a plan nobody will display again; the pin only
    * spends a few KB of plan objects per site per session. */
  def pin(s: SparkSession, value: AnyRef): Unit = {
    val it = pins.iterator()
    while (it.hasNext)
      if (it.next().session.sparkContext.isStopped) it.remove()
    pins.add(Entry(s, value))
  }

  /** `df.localCheckpoint(eager = false)` with the originating plan pinned
    * (see [[pin]]). Lazy by design: an eager checkpoint runs jobs at
    * DataFrame CONSTRUCTION time, i.e. during schema/plan-only
    * inspections. Every multi-consumer shared subplan in the engine
    * (q78/q133's cluster relation, q122/q129, MinHash, SemanticDedup)
    * goes through here. */
  def lazyLocalCheckpoint(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    pin(df.sparkSession, df)
    df.localCheckpoint(eager = false)
  }

  /** Visible for tests: current number of live pins. */
  private[graft] def pinCount: Int = pins.size()
}
