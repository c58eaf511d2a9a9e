package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge

/** Column-API surface over Spark's native bloom-filter expressions — the
  * same `BloomFilterAggregate` / `BloomFilterMightContain` pair Catalyst
  * injects for runtime join filters, exposed for explicit membership
  * pre-filtering (e.g. decontamination against a benchmark shingle set).
  *
  * Both expressions operate on pre-hashed LONG keys (`xxhash64` of the
  * value), matching Spark's own runtime-filter wiring. The aggregate's
  * sketch is merged tree-wise by partial aggregation (bit-OR — order
  * independent), and `might_contain` is a point probe with NO false
  * negatives: every inserted key tests true, by construction.
  */
object BloomSketch {

  /** Aggregate a LONG key column into a bloom-filter sketch (binary).
    * `numBits` fixes the sketch size up front — a deliberate constant so
    * the operator costs one pass; size it for the expected distinct count
    * (~16 bits/item ≈ 0.05% FPR). */
  def bloomAgg(hashedKey: Column, expectedItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(Bridge.eagerExpression(hashedKey),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Probe a bloom sketch with a LONG key. True = maybe present (bounded
    * false-positive rate); false = definitely absent.
    *
    * `bloomDf` must be a single-row, single-column frame produced by
    * [[bloomAgg]]; it crosses the plan as a scalar subquery — the form
    * `might_contain` requires (same wiring as Catalyst's injected runtime
    * join filters), evaluated once and shipped to executors as a
    * constant. */
  def mightContain(bloomDf: DataFrame, hashedKey: Column): Column =
    Bridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomDf.queryExecution.logical),
      Bridge.eagerExpression(hashedKey)))

  /** Materialize a sketch to its serialized bytes — model state (a few MB
    * at most, fixed by `numBits`), the dimension-table pattern: collect
    * once, ship to executors as a literal. The form a STREAMING plan needs
    * (a scalar subquery can't cross the micro-batch boundary). */
  def buildSketch(keys: DataFrame, hashedKey: Column,
      expectedItems: Long, numBits: Long): Array[Byte] = {
    val bf = keys.agg(bloomAgg(hashedKey, expectedItems, numBits).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    // an empty key frame aggregates to null; probing a null sketch yields
    // null → every filter silently drops → a decontamination screen that
    // flags NOTHING. Fail fast: an empty eval set is a caller bug (typo'd
    // source filter), not a sketch to probe.
    require(bf != null, "bloom sketch over an empty key set — check the filter")
    bf
  }

  /** Probe a pre-built sketch shipped as a binary literal — foldable, so
    * it works anywhere an expression does, including inside higher-order
    * function lambdas and streaming projections. */
  def mightContainLit(sketch: Array[Byte], hashedKey: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(sketch, org.apache.spark.sql.types.BinaryType),
      Bridge.eagerExpression(hashedKey)))
}
