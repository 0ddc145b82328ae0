package graft.api

import org.apache.spark.sql.SparkSession

/** Entry point for the graft engine: a tuned SparkSession factory.
  *
  * Replaces the reference's `main_entry/db.rs` + `client_context.rs`
  * (TemplateDB's DatabaseInstance/ClientContext): where the reference
  * hand-builds a volcano pipeline per query, graft declares plans on a
  * SparkSession and lets Catalyst/Tungsten choose physical execution.
  *
  * Scale notes (100 TB target): AQE on (runtime re-plan, skew-join
  * splitting, partition coalescing), broadcast threshold raised so all
  * TPC-H-style dims broadcast, shuffle partitions sized for the local
  * harness via `GRAFT_SHUFFLE_PARTITIONS` (on a real cluster this is
  * set to ~2-3x total cores or left to AQE).
  */
object GraftSession {
  def builder(appName: String = "graft", master: String = "local[32]",
              shufflePartitions: Option[Int] = None): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.map(_.toString)
          .getOrElse(sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", "32")))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_ADAPTIVE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      // Scan-split sizing (SURVEY §6/§8: size file partitions to the
      // data). The defaults are the right call at the 100 TB target
      // (~128 MB splits over thousands of files); on a small-SF
      // harness whose files are single-digit MB they leave every scan
      // on one core, so the bench harness can right-size them per
      // layout via env without touching cluster defaults.
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", (128L << 20).toString))
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("GRAFT_OPEN_COST_BYTES", (4L << 20).toString))
      // Larger parquet reader batches amortize per-batch dispatch in
      // scan-bound aggregates (r9 lab: q1_agg −8%, measured at sf0.1).
      // 16k rows × 8 B × ~16 cols ≈ 2 MB per open batch — negligible
      // against executor memory at any scale; env knob for re-tuning.
      .config("spark.sql.parquet.columnarReaderBatchSize",
        sys.env.getOrElse("GRAFT_READER_BATCH", "16384"))
      .config("spark.sql.session.timeZone", "UTC")
      // Parquet timestamp posture, pinned ONCE at session build (not
      // per-load — a loader mutating session confs is action-at-a-
      // distance for unrelated reads): NTZ inference off so naive
      // micros read as TimestampType (exact under the UTC pin, no
      // post-scan cast blocking pushdown); legacy nanos surface as
      // long for graft.sources.Tables' integer-div truncation.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One-call open — the equivalent of the reference's "connect to
    * the database" entry (`main_entry/db.rs`): a tuned session with
    * the star schema registered as views and the graft functions
    * injected, so `GraftSession.open(dir).sql("...")` runs any query
    * in this library's surface, custom expressions included. */
  def open(dataDir: String): SparkSession = {
    val s = getOrCreate()
    graft.sources.Tables.registerAll(s, dataDir)
    s
  }
}
