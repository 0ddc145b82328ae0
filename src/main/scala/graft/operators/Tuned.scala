package graft.operators

import org.apache.spark.sql.SparkSession

/** Per-operator scheduling pin for FIXED-SHAPE, BOUNDED-OUTPUT
  * queries (r12): under AQE every shuffle stage materializes as its
  * own scheduler job — measured 30-50 ms of driver/scheduler constant
  * per job at sf0.1 (PROFILE job timelines), which dominates
  * dashboard-sized queries whose entire task time is <200 ms. For an
  * op whose reduce side is provably bounded (a ≤|groups|-row
  * aggregate behind Bounded.ordered), AQE's only remaining service —
  * post-shuffle coalescing — is a no-op the plan already encodes, so
  * the op runs on a derived session with AQE off and a small static
  * shuffle-partition count: the whole query becomes ONE scheduler job
  * (all stages submitted together), saving one job handoff + one AQE
  * re-optimization per shuffle.
  *
  * NOT for corpus-sized shuffles: there AQE's runtime re-planning
  * (skew splits, join-strategy switches, right-sizing) is the 100 TB
  * safety net — those ops keep the parent session. This is the same
  * measured-pin discipline as largeSmallStar's loop (r11/r12) and the
  * q65 isolated-session precedent.
  *
  * The derived session is memoized per parent (same pattern and
  * lifetime as [[graft.sources.Tables]]' plan cache): one
  * SessionState per JVM, Tables' per-session relation cache stays
  * warm, and NOTHING on the caller's session is mutated — a
  * concurrent caller keeps AQE (the ADVICE r11 isolation rule).
  */
object Tuned {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, SparkSession]()
  private val cacheMin =
    new java.util.concurrent.ConcurrentHashMap[Int, SparkSession]()

  /** AQE kept fully on, but the post-shuffle COALESCE floor lowered
    * from Spark's 1 MB default to 64 KB: with parallelismFirst
    * coalescing (the default), AQE targets
    * max(totalBytes/parallelism, minPartitionSize) — a 2-3 MB
    * dashboard-scale shuffle coalesces to 1-2 partitions under the
    * 1 MB floor, serializing a window/agg stage 32 cores could run in
    * parallel. At cluster scale totalBytes/parallelism dwarfs either
    * floor, so the knob only affects small shuffles (scale-neutral by
    * construction). Derived-session isolation as [[boundedReduce]]. */
  def parallelCoalesce(parent: SparkSession): SparkSession =
    cacheMin.computeIfAbsent(System.identityHashCode(parent), _ => {
      val s = parent.newSession()
      s.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "65536")
      s
    })

  /** Shuffle partitions for the pinned ops: enough to spread a
    * bounded reduce, few enough that task-launch overhead stays
    * under one job handoff even on a 32-core local harness. */
  val PinnedShufflePartitions = 8

  def boundedReduce(parent: SparkSession): SparkSession =
    cache.computeIfAbsent(System.identityHashCode(parent), _ => {
      val s = parent.newSession()
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.conf.set("spark.sql.shuffle.partitions",
        PinnedShufflePartitions.toString)
      s
    })
}
