package graft.kv

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Directory-backed KV run log: the durable ingest side of [[KVTable]].
  *
  * The reference guards every write with a WAL
  * (`/root/reference/src/storage_engine/src/wal/wal_record_writer.rs`):
  * a crash mid-write must never expose a torn record to readers. The
  * Spark-native equivalent is commit-by-rename — each batch is written
  * to a hidden temp dir and atomically renamed into place only after
  * the job (and its `_SUCCESS` marker) completes. Readers list only
  * committed runs, so a killed mid-parquet-write append is simply
  * invisible: no partial file, no torn row, no repair step.
  *
  * Every run — including fresh, UN-compacted ones — is written with a
  * parquet bloom filter on the key column (the analog of the
  * reference's `cache/bloom_filter_cache.rs` over SSTables). Min/max
  * row-group stats only prune point gets after compaction key-clusters
  * the files; an uncompacted run's key range spans everything, so
  * without the bloom filter every point get decodes every run. With
  * it, a probe for a key absent from a run skips the run's row groups
  * without touching a data page.
  *
  * Layout: `<path>/run_<id>/` committed parquet runs; `<path>/.tmp_*`
  * in-flight writes (never read). Run ids are monotone per append so
  * newest-run-wins debugging stays easy; correctness needs only the
  * row-level `seqCol` (latest-wins merge), not file order.
  */
final case class KVLog(path: String, keyCol: String, seqCol: String,
                       tombstoneCol: String) {

  /** Durably append one batch as a new committed run. Crash-safe:
    * temp-dir write + atomic rename; a reader never sees the run
    * until the rename, and the rename happens only after Spark's
    * `_SUCCESS` commit marker exists. */
  def append(batch: DataFrame): Unit = {
    Files.createDirectories(Paths.get(path))
    sweepOrphanedTemps()
    val id = s"${System.currentTimeMillis()}_${java.util.UUID.randomUUID().toString.take(8)}"
    val tmp = Paths.get(path, s".tmp_run_$id")
    batch.write
      .option(s"parquet.bloom.filter.enabled#$keyCol", "true")
      .parquet(tmp.toString)
    require(Files.exists(tmp.resolve("_SUCCESS")),
      s"parquet job left no _SUCCESS marker under $tmp")
    Files.move(tmp, Paths.get(path, s"run_$id"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Crashed appends leave `.tmp_run_*` dirs behind — invisible to
    * readers but never reclaimed otherwise (the reference WAL recycles
    * its segments). Swept at the next append; the age floor keeps a
    * concurrent in-flight write (same log, another session) safe. */
  private def sweepOrphanedTemps(maxAgeMs: Long = 10 * 60 * 1000): Unit = {
    val cutoff = System.currentTimeMillis() - maxAgeMs
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(".tmp_run_") &&
        f.lastModified() < cutoff)
      .foreach(graft.sources.LocalDir.deleteRecursively)
  }

  /** Wipe the whole log — the retry path for a MULTI-append build
    * that died between appends: unlike a single commit-by-rename,
    * partial progress across appends is durable, so the builder must
    * detect incompleteness (run count) and start over. */
  def reset(): Unit =
    graft.sources.LocalDir.deleteRecursively(new java.io.File(path))

  /** Committed run directories (have both the `run_` name, i.e. the
    * rename happened, and the `_SUCCESS` marker). Torn or in-flight
    * writes fail one of the two and are never read. */
  def committedRuns: Seq[String] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("run_") &&
        new java.io.File(f, "_SUCCESS").exists())
      .map(_.getAbsolutePath).sorted.toSeq

  /** The log as a [[KVTable]] (union of committed runs only). */
  def table(spark: SparkSession): KVTable = {
    val runs = committedRuns
    require(runs.nonEmpty, s"no committed runs under $path")
    KVTable(spark.read.parquet(runs: _*), keyCol, seqCol, tombstoneCol)
  }

  /** Latest-wins merged view (see [[KVTable.merged]]). */
  def merged(spark: SparkSession): DataFrame = table(spark).merged()

  /** Point get pushed to the scan — with bloom-filtered runs this
    * prunes whole row groups of runs that don't contain the key. */
  def get(spark: SparkSession, key: Long): DataFrame =
    table(spark).get(org.apache.spark.sql.functions.lit(key))
}
