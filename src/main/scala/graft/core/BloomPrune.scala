package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Semi-join reduction with a Bloom filter — the explicit form of the
  * optimizer's runtime-filter rewrite, for when the filter side is a
  * separately-computed frame the optimizer cannot see through (a
  * snapshot read, a previous pipeline stage, a driver-cached dimension).
  *
  * Shape at 100 TB: the dimension aggregates into ONE bloom bitmap
  * (map-side combinable, a few MB for tens of millions of keys — the
  * only thing that reaches the driver), the bitmap ships to executors as
  * a literal in the task binary, and the fact table filters BEFORE its
  * join shuffle. A 1% survivor rate means the join shuffles 1% of the
  * bytes. False positives only ever ADD pre-join rows; the join itself
  * removes them, so results are bit-identical to the unfiltered join.
  *
  * Uses Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
  * expressions (the pair behind `spark.sql.optimizer.runtime.bloomFilter`),
  * so the probe side stays inside whole-stage codegen.
  */
object BloomPrune {

  /** Serialized bloom over `xxhash64(dimKey)`; null when `dim` is empty. */
  def bloomOf(dim: DataFrame, dimKey: Column,
              expectedItems: Long = 1000000L,
              numBits: Long = 8388608L): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(Bridge.expression(dimKey))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val row = dim.select(Bridge.column(agg)).head()
    if (row.isNullAt(0)) null else row.getAs[Array[Byte]](0)
  }

  /** `fact` reduced to rows whose `factKey` MIGHT match a `dimKey` —
    * a superset of the semi join, cheap enough to sit ahead of the join
    * shuffle. An empty dimension yields an empty fact (matching the
    * inner-join result). */
  def semiJoinReduce(fact: DataFrame, factKey: Column,
                     dim: DataFrame, dimKey: Column,
                     expectedItems: Long = 1000000L,
                     numBits: Long = 8388608L): DataFrame = {
    val bloom = bloomOf(dim, dimKey, expectedItems, numBits)
    if (bloom == null) fact.limit(0)
    else fact.filter(Bridge.column(new BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(Bridge.expression(factKey))))))
  }
}
