package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64

/** Column-API front door to Spark's OWN bloom-filter expressions — the
  * pair Catalyst's runtime-filter injection plants on shuffle joins
  * (`BloomFilterAggregate` / `BloomFilterMightContain`; neither is in the
  * public function registry, so a library exposes them through the same
  * bridge as our native expressions).
  *
  * Why this beats a driver-side `DataFrameStatFunctions.bloomFilter`: the
  * filter is built by an AGGREGATE inside the plan and delivered to the
  * probe side as a scalar subquery (`Dataset.scalar()`), so nothing is
  * collected through the driver and the subquery result ships to
  * executors once, like a broadcast — the query path stays action-free
  * (the repo-wide rule).
  *
  * Both sides hash through `xxhash64` (the aggregate ingests longs), so
  * build and probe agree by construction. A bloom filter has NO false
  * negatives at ANY sizing — a member's bits are always set — so a
  * prescreen keeps every true match regardless of capacity; false
  * positives only add rows to whatever exact confirm step follows
  * (ScrubSpec pins this with a deliberately saturated 8-item filter).
  * Sizing only tunes the prescreen's selectivity: [[bitsFor]] is the
  * standard m = ⌈-n·ln p / ln²2⌉ rule, executable like `Ann.planesFor`.
  */
object Bloom {

  /** Optimal bit count for `items` keys at false-positive rate `fpp`. */
  def bitsFor(items: Long, fpp: Double): Long = {
    require(items > 0 && fpp > 0 && fpp < 1, s"bad bloom sizing: $items, $fpp")
    math.ceil(-items * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }

  /** Aggregate column building a bloom filter over `value` (any type —
    * hashed to long). `items` is a CALLER-DECLARED capacity (plan-time
    * constant, no runtime probe — same discipline as `Scale.prefixSum`'s
    * smallInput flag); overflow degrades fpp, never correctness. */
  def filterAgg(value: Column, items: Long, fpp: Double = 0.03): Column =
    GraftSqlBridge.columnOf(new BloomFilterAggregate(
      GraftSqlBridge.expressionOf(xxhash64(value)),
      Literal(items), Literal(bitsFor(items, fpp))).toAggregateExpression())

  /** Membership probe: `bloomScalar` must be a scalar-subquery or constant
    * column (e.g. `df.agg(filterAgg(...)).scalar()`). */
  def mightContain(bloomScalar: Column, value: Column): Column =
    GraftSqlBridge.columnOf(BloomFilterMightContain(
      GraftSqlBridge.expressionOf(bloomScalar),
      GraftSqlBridge.expressionOf(xxhash64(value))))
}
