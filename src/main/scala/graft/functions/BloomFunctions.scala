package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}

/** Explicit bloom-filter probe surface (reference analog: the
  * SSTable bloom cache, `storage_engine/src/cache/bloom_filter_cache
  * .rs`, applied at the DATAFLOW level instead of the file level).
  *
  * Spark ships `BloomFilterMightContain` for its own runtime-filter
  * rewrite but does not register it as a callable function; graft
  * exposes it as `graft_might_contain(bloomBytes, longValue)` so an
  * operator can PRE-FILTER a stream against a bloom built with the
  * public `DataFrameStatFunctions.bloomFilter` (distributed
  * treeAggregate build, driver-held bytes — index metadata, like the
  * IVF centroids). The expression is codegen'd and the serialized
  * filter is deserialized once per task, so probing rides
  * whole-stage codegen.
  *
  * The filter bytes must come from a bloom built over a LONG column
  * (`putLong` insertions) — `mightContainLong` is what the
  * expression evaluates; feed it `xxhash64(content)` on both sides.
  */
object BloomFunctions {
  def buildMightContain(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"graft_might_contain expects (bloomBytes, value), got ${args.length} args")
    BloomFilterMightContain(args.head, args(1))
  }
}
