package graft.kv

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LSM KV-table semantics on immutable columnar batches, Spark-first.
  *
  * The reference's storage engine (`/root/reference/src/storage_engine`:
  * memtable skiplist + WAL + leveled SSTables + merge iterators +
  * compaction + version_set snapshots) maintains *mutable* state whose
  * read path is "merge all runs, latest sequence wins, drop
  * tombstones". graft re-expresses exactly that read semantic over
  * *immutable* row batches: a KV table is rows `(key, seq, tombstone,
  * value…)` spread across any number of "run" files, and every read is
  * a latest-wins merge.
  *
  * Scale design (100 TB): the merge is ONE hash shuffle on `key` via
  * `max_by` aggregation (partial/map-side combine halves shuffle
  * volume) — never a window sort, which would add a per-partition sort
  * on top of the same shuffle. Point gets and range scans filter on
  * `key` BEFORE merging, so the predicate reaches the parquet scan
  * (partition/row-group pruning); on a real deployment runs are
  * written partitioned by key-range (see [[compacted]]) making point
  * reads touch one partition. Snapshots (`asOf`) filter on `seq`
  * before the merge — also pushed to the scan.
  *
  * @param runs   union of all run files
  * @param keyCol key column name
  * @param seqCol monotonically increasing sequence (reference:
  *               `storage_engine`'s per-write sequence number)
  * @param tombstoneCol boolean delete marker
  */
final case class KVTable(runs: DataFrame, keyCol: String, seqCol: String,
                         tombstoneCol: String) {

  private def payloadCols: Seq[String] =
    runs.columns.filterNot(c => c == keyCol || c == seqCol || c == tombstoneCol).toSeq

  /** Latest-wins merge of all runs, tombstones dropped: the semantic
    * equivalent of the reference's full merge-iterator read
    * (`storage_engine/src/iterator`). Optionally at a snapshot.
    *
    * Deliberately PER-COLUMN `max_by(c, seq)` (seq is unique, so all
    * columns resolve to the same winning row) rather than one
    * `max_by(struct(...), seq)`: a struct-valued aggregation buffer
    * can't use HashAggregate's mutable row and silently degrades the
    * whole merge to SortAggregate — per-partition sorts of every run
    * on both sides of the shuffle. Primitive buffers keep it a pure
    * hash aggregation with map-side combine. */
  def merged(asOf: Option[Long] = None): DataFrame = {
    val visible = asOf.fold(runs)(s => runs.filter(col(seqCol) <= s))
    val aggs = max(col(seqCol)).as(seqCol) +:
      (tombstoneCol +: payloadCols).map(c => max_by(col(c), col(seqCol)).as(c))
    visible
      .groupBy(col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
      .filter(!col(tombstoneCol))
      .select((keyCol +: seqCol +: payloadCols).map(col): _*)
  }

  /** Point lookup, latest version (reference: `db_impl` get through
    * memtable → SSTable levels). Key filter applied pre-merge so it
    * pushes down to the scan. */
  def get(key: Column): DataFrame =
    copy(runs = runs.filter(col(keyCol) === key)).merged()

  /** Ordered key-range scan with latest-wins merge (reference:
    * range iterators over the merge iterator). The range predicate
    * is CALLER-CONTROLLED, so the result is client-sized only when
    * the caller's range is (VERDICT r9 task 3): the single-partition
    * zero-exchange sort applies only while the planned size estimate
    * of the admitted runs stays under [[KVTable.BoundedReadBytes]];
    * a wide range over a big table keeps `orderBy`'s sampled range
    * exchange — ordered output either way, never a single-task
    * reduce of the whole keyspace. */
  def range(lo: Column, hi: Column,
            boundedBytes: Long = KVTable.BoundedReadBytes): DataFrame =
    graft.operators.Bounded.orderedIfSmall(
      copy(runs = runs.filter(col(keyCol).between(lo, hi))).merged(),
      boundedBytes, col(keyCol))

  /** Batched point lookups — the MultiGet API face (reference:
    * `db_impl`'s multi-key read; RocksDB exposes it because a batch
    * of gets amortizes one scan/iterator setup across keys instead
    * of paying it per key). The whole batch becomes ONE `IN`-list
    * predicate applied pre-merge, so it reaches the parquet scan as
    * a single pushed filter (min/max + bloom pruning reject row
    * groups holding none of the keys) and the latest-wins merge runs
    * once over the union of survivors — k point gets for the price
    * of one pruned scan. Missing keys simply produce no row. The
    * result is ≤|keys| rows, but the PLAN-side guarantee follows
    * the same size gate as [[range]] (the caller controls |keys|). */
  def multiGet(keys: Seq[Any],
               boundedBytes: Long = KVTable.BoundedReadBytes): DataFrame =
    graft.operators.Bounded.orderedIfSmall(
      copy(runs = runs.filter(col(keyCol).isin(keys: _*))).merged(),
      boundedBytes, col(keyCol))

  /** Read overlaying RANGE tombstones — RocksDB `DeleteRange`
    * semantics (the reference's storage engine deletes point keys;
    * RocksDB generalized the tombstone to a key interval because
    * deleting a key range by enumerating members costs a full scan
    * at write time). A range tombstone `[lo, hi) @ seq` deletes
    * every covered key version with a SMALLER seq; a put written
    * after the tombstone is visible again. Reads resolve exactly as
    * RocksDB's fragmented-tombstone overlay: per key take the
    * latest put/point-delete entry, then drop it if any covering
    * range tombstone is newer.
    *
    * `rts` is `(lo, hi, seq)` with `hi` EXCLUSIVE. Scale: the
    * tombstone list is index metadata (RocksDB keeps it in-memory
    * per SSTable), orders of magnitude smaller than the data — the
    * coverage check is a broadcast anti join against it, never a
    * data-sized shuffle. */
  def mergedWithRangeDeletes(rts: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    // latest entry per key INCLUDING point tombstones — the range
    // overlay must compare against the newest entry of any kind
    val aggs = max(col(seqCol)).as(seqCol) +:
      (tombstoneCol +: payloadCols).map(c => max_by(col(c), col(seqCol)).as(c))
    val latest = runs.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    latest
      .join(broadcast(rts),
        col(keyCol) >= rts("lo") && col(keyCol) < rts("hi") &&
          rts("seq") > latest(seqCol),
        "left_anti")
      .filter(!col(tombstoneCol))
      .select((keyCol +: seqCol +: payloadCols).map(col): _*)
  }

  /** MVCC snapshot read as-of a sequence number (reference:
    * `manager/version_set.rs` + snapshots pin a sequence). */
  def snapshot(asOf: Long): DataFrame = merged(Some(asOf))

  /** Apply a write batch (upserts + deletes with seqs above every
    * existing seq), reference `memtable/batch.rs`: the batch is just
    * one more run unioned in; latest-wins gives batch rows
    * precedence. */
  def withBatch(batch: DataFrame): KVTable =
    copy(runs = runs.unionByName(batch))

  /** Compaction: N runs → a single deduped run with tombstones
    * dropped (reference `compaction/`). Returned sorted by key — a
    * caller writing this out gets key-range-clustered files
    * (`sortWithinPartitions` after `repartitionByRange` on a real
    * cluster), which is what makes future point reads prune. */
  /** Size-gated like [[range]] (r11; comment fixed r12 per ADVICE):
    * the latest-wins hash-aggregate MERGE stays parallel on the
    * sampled path, but on the small path the coalesce(1) folds the
    * post-exchange final-merge stage into one task — acceptable
    * exactly because the gate (with its decompression factor) bounds
    * what that task can hold; only the map-side partials are
    * parallel either way. */
  def compacted(): DataFrame =
    graft.operators.Bounded.orderedIfSmall(
      merged(), KVTable.BoundedReadBytes, col(keyCol))

  /** Leveled (partial) compaction, reference `compaction/`'s level
    * picker: fold only the runs with `seq <= upToSeq` (the OLD end of
    * the log — in LSM terms, everything at and below the chosen
    * level) into one run, leaving younger runs untouched. The merged
    * read over [compacted-prefix ∪ young runs] is identical to the
    * original because latest-wins is prefix-stable: a key whose
    * overall winner is young is overridden regardless of what the
    * prefix folded to, and a key whose overall winner is old gets
    * exactly the prefix-merge result.
    *
    * Tombstones ARE dropped here — safe only because the compacted
    * prefix includes the bottom of the tree (there is no older run
    * left that a dropped tombstone still needed to shadow). This is
    * the same rule the reference applies: deletes are erased only in
    * a bottom-level compaction. A mid-level fold would have to keep
    * them; [[merged]] with the tombstone filter removed would express
    * that variant.
    *
    * At scale this is the whole point of leveling: compaction I/O is
    * proportional to the chosen prefix, not the table, so write
    * amplification is tunable while reads stay a single latest-wins
    * merge. */
  def compactedUpTo(upToSeq: Long): KVTable = {
    val prefix = copy(runs = runs.filter(col(seqCol) <= upToSeq)).merged()
      .withColumn(tombstoneCol, lit(false))
    val young = runs.filter(col(seqCol) > upToSeq)
    copy(runs = prefix.unionByName(young))
  }

  /** Compaction write path: materialize the merged view as
    * `numRanges` key-range-clustered parquet runs (the Spark analog
    * of the reference's leveled output: disjoint key ranges per
    * file). Range partitioning + within-partition sort give every
    * file tight min/max key stats, so subsequent [[get]]/[[range]]
    * predicates prune to one file/row-group at the scan.
    *
    * A parquet bloom filter is written on the key column (the analog
    * of the reference's `cache/bloom_filter_cache.rs` over SSTables):
    * min/max stats alone can't reject a point probe that falls
    * INSIDE a row group's key range but isn't present — common once
    * upstream runs aren't clustered or keys are high-cardinality
    * non-contiguous; the bloom filter rejects those row groups
    * without decoding a page. */
  def compactTo(path: String, numRanges: Int): KVTable = {
    merged()
      .repartitionByRange(numRanges, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite")
      .option(s"parquet.bloom.filter.enabled#$keyCol", "true")
      .parquet(path)
    val reloaded = runs.sparkSession.read.parquet(path)
      .withColumn(tombstoneCol, org.apache.spark.sql.functions.lit(false))
    KVTable(reloaded, keyCol, seqCol, tombstoneCol)
  }
}

object KVTable {
  /** Planned-size ceiling under which a range()/multiGet() result is
    * treated as client-sized (zero-exchange single-partition sort,
    * Bounded's contract). 64 MB ≈ a generous client page; reads whose
    * admitted runs estimate wider keep the sampled range sort. The
    * estimate is size-only (a Filter doesn't shrink it), so the gate
    * errs toward the scale-safe shape on big tables. */
  val BoundedReadBytes: Long = 64L << 20
}
