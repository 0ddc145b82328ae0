package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Per-phase wall-clock attribution for a query (VERDICT r7 task 1).
  *
  * Splits one benchmarked execution into the pieces a cluster either
  * amortizes or pays per-stage, so "Nx DuckDB" ratios on sub-second
  * queries can be read against the harness floor instead of argued:
  *
  *  - construct_s: `SparkEntry.queries(name)` call — DataFrame
  *    assembly including parquet file listing + footer schema reads
  *    (paid once per table per session with the Tables cache).
  *  - analysis/optimization/planning_s: Catalyst phases from the
  *    QueryPlanningTracker of the EXECUTED (write) QueryExecution.
  *  - exec_wall_s: action wall time minus the tracked phases.
  *  - task_time_s / max_task_s / tasks / stages / jobs: from a
  *    SparkListener — `exec_wall - critical path of max tasks` is
  *    scheduler+commit overhead, the part that amortizes per stage
  *    on a long-running cluster job.
  *
  * Usage: runMain graft.Profile [sfDir] [query ...] (defaults:
  * SPARK_GRAFT_SF_DIR, q10_multi_join + kv_range_scan). Emits one
  * JSON line per query and target/profile.json with all of them.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q10_multi_join", "kv_range_scan")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.api.GraftSession
      .builder("graft-profile", s"local[$cpus]", Some(cpus.toInt))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one listener, zeroed per measured run
    object L extends SparkListener {
      @volatile var jobs, stages, tasks = 0
      @volatile var taskTimeMs, maxTaskMs = 0L
      @volatile var stageCritMs = 0L // sum over stages of that stage's max task
      private val perStageMax = scala.collection.concurrent.TrieMap[Int, Long]()
      def reset(): Unit = { jobs = 0; stages = 0; tasks = 0
        taskTimeMs = 0; maxTaskMs = 0; stageCritMs = 0; perStageMax.clear() }
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        stageCritMs += perStageMax.getOrElse(s.stageInfo.stageId, 0L)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        val d = Option(t.taskInfo).map(_.duration).getOrElse(0L)
        taskTimeMs += d
        if (d > maxTaskMs) maxTaskMs = d
        perStageMax.updateWith(t.stageId)(m => Some(math.max(m.getOrElse(0L), d)))
      }
    }
    spark.sparkContext.addSparkListener(L)

    // capture the write action's QueryExecution (not df.queryExecution
    // — the writer wraps the plan in a command and tracks its own
    // phases) via the public QueryExecutionListener hook
    val lastQe = new java.util.concurrent.atomic.AtomicReference[
      org.apache.spark.sql.execution.QueryExecution](null)
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(fn: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = lastQe.set(qe)
        override def onFailure(fn: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      })

    def one(name: String, warm: Boolean): String = {
      if (!warm) { // cold pass primes codegen/JIT, untimed
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      L.reset()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      Thread.sleep(150) // let the async listener bus drain task events
      val phases = Option(lastQe.get()).map(_.tracker.phases)
        .getOrElse(Map.empty[String,
          org.apache.spark.sql.catalyst.QueryPlanningTracker.PhaseSummary])
      def ph(k: String): Double =
        phases.get(k).map(p => (p.endTimeMs - p.startTimeMs) / 1e3).getOrElse(0.0)
      val constructS = (t1 - t0) / 1e9
      val wallS = (t2 - t1) / 1e9
      f"""{"query":"$name","warm":$warm,"construct_s":$constructS%.4f,""" +
        f""""analysis_s":${ph("analysis")}%.4f,"optimization_s":${ph("optimization")}%.4f,""" +
        f""""planning_s":${ph("planning")}%.4f,"exec_wall_s":$wallS%.4f,""" +
        f""""task_time_s":${L.taskTimeMs / 1e3}%.4f,"stage_critical_s":${L.stageCritMs / 1e3}%.4f,""" +
        f""""max_task_s":${L.maxTaskMs / 1e3}%.4f,"jobs":${L.jobs},"stages":${L.stages},"tasks":${L.tasks}}"""
    }

    val lines = names.flatMap { n =>
      val cold = one(n, warm = false)
      val warm = one(n, warm = true)
      Seq(cold, warm)
    }
    lines.foreach(println)
    val out = "[" + lines.mkString(",\n") + "]\n"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/profile.json"), out)
    spark.stop()
  }
}
