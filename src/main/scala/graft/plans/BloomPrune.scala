package graft.plans

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join pruning — discard probe-side rows that cannot
  * match BEFORE they reach the join's shuffle.
  *
  * At 100 TB the dominant cost of `big ⋈ small` (when `small` is too
  * large to broadcast-join outright but far smaller than `big`) is
  * shuffling `big`. A bloom filter over `small`'s join keys is a few MB
  * regardless of `big`'s size; shipped to every task as a literal it
  * turns the join into: scan `big` → codegen'd bit-probe filter (drops
  * the overwhelming majority of non-matching rows map-side) → exchange
  * only survivors → exact join. False positives (rate `fpp`) pass the
  * filter and are dropped by the exact join, so results are identical
  * to the unpruned join — the bloom is pure shuffle avoidance, never a
  * correctness device.
  *
  * This is the same mechanism as Spark's runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), exposed as an
  * explicit operator: the optimizer's version only fires on plans with a
  * selective creation-side filter under size thresholds, while a
  * pipeline author often KNOWS the semi-join is sparse (decontamination
  * against a benchmark set, dedup-id anti-joins, retention allowlists).
  *
  * Implementation notes:
  *  - both sides hash their key tuple with `xxhash64` (seed 42, the
  *    codegen'd built-in) to a LONG; the filter stores/probes longs, so
  *    probe cost is hash + ~`-log2(fpp)` bit reads;
  *  - the build side runs one small aggregation job
  *    (`DataFrameStatFunctions.bloomFilter`) — same driver round-trip
  *    contract as `broadcast()`;
  *  - the probe predicate is Spark's own codegen'd
  *    [[BloomFilterMightContain]] with the serialized filter inlined as
  *    a binary literal, so the filter stays inside whole-stage codegen
  *    and is eligible for map-side evaluation right above the scan.
  */
object BloomPrune {

  /** Serialized bloom filter over `xxhash64(keys)` of `build`.
    * `expectedItems` sizes the filter (overestimate = more bits, same
    * correctness); `fpp` is the target false-positive rate. */
  def buildFilter(build: DataFrame, keys: Seq[Column], expectedItems: Long,
      fpp: Double): Array[Byte] = {
    require(keys.nonEmpty, "bloom build needs at least one key column")
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val bf = build.select(xxhash64(keys: _*).as("_bf_k"))
      .stat.bloomFilter("_bf_k", expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Probe predicate: true iff `xxhash64(keys)` might be in `filter`.
    * Guaranteed true for every key the build side contains. */
  def mightContain(filter: Array[Byte], keys: Seq[Column]): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(filter, BinaryType),
      ColumnBridge.expression(xxhash64(keys: _*))))
}
