// Same package rationale as CosineSimilarity.scala: BloomFilterAggregate /
// BloomFilterMightContain and the Column↔Expression bridge are private[sql].
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.classic.ExpressionUtils

/** Column-API access to Spark's runtime-filter bloom machinery.
  *
  * Spark's own `InjectRuntimeFilter` rule builds exactly this pair —
  * `BloomFilterAggregate(XxHash64(key))` on the creation side and
  * `BloomFilterMightContain(bloom, XxHash64(key))` on the application
  * side — but only fires on its internal cost heuristics. Exposing the
  * same expressions as Columns lets graft build an EXPLICIT semi-join
  * reduction (see `graft.operators.BloomReduce`) when the pipeline
  * author knows the dim side is selective: the probe side is filtered
  * BEFORE its shuffle, which is the whole win at 100 TB — rows that
  * cannot match never leave the scan stage.
  *
  * Both sides hash with the same seeded [[XxHash64]], so there are no
  * false negatives by construction; false positives are eliminated by
  * the real join that follows. The reference has no counterpart (its
  * single-node joins are pandas merges, data_transformers.py); this is
  * the Spark-scale equivalent of its "filter before merge" advice.
  */
object BloomFilterShim {

  /** Aggregate a key column into a serialized bloom filter (binary).
    * `numBits` bounds the driver-side object: 8M bits = 1 MiB for ~1M
    * distinct keys at ~1% fpp. */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ExpressionUtils.expression(key))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a serialized bloom filter (use a
    * `lit(bytes)` broadcast-as-literal for the filter side). */
  def mightContain(bloom: Column, key: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(
        ExpressionUtils.expression(bloom),
        new XxHash64(Seq(ExpressionUtils.expression(key)))))
}
