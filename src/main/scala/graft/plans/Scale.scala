package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities: skew salting and bucketed co-located joins — the
  * knobs a 100 TB deployment turns when AQE's automatic handling isn't
  * enough (SURVEY.md §4: skew handling / partitioned layout are layout
  * decisions for this engine, absent in the reference).
  */
object Scale {

  /** Two-phase salted aggregation for heavily-skewed group keys: phase 1
    * aggregates on (key, salt) — spreading one hot key over `saltBuckets`
    * reducers — phase 2 merges the partials per key. Only ever needed
    * for algebraic aggregates (sum/count/min/max); AQE skew-join
    * handling covers the join side automatically.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    // spark_partition_id is deterministic per row *placement*, not per
    // row value — for a value-deterministic salt use a hash of other
    // columns; for pure load-spreading a random salt would do but
    // breaks retry determinism, so hash the value column instead.
    val salted = df.withColumn("__salt",
      pmod(hash(col(valueCol)), lit(saltBuckets)))
    salted.groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"),
        count(lit(1)).as("__pcount"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"${valueCol}_sum"),
        sum(col("__pcount")).as("n"))
  }

  /** Write a table bucketed (and sorted) by the join key: co-located,
    * shuffle-free equi-joins for every downstream query that joins on
    * that key — the lake-layout decision that amortizes one shuffle at
    * write time across all reads. Uses the session catalog
    * (`saveAsTable`; plain `parquet(path)` cannot carry bucket
    * metadata). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed catalog tables on their bucket key. With
    * matching bucket counts the plan is a SortMergeJoin with NO
    * Exchange on either side. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
