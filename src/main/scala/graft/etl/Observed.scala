package graft.etl

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Observation, Row, SparkSession}
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** O5/O6 in-flight metrics via `Dataset.observe` — the Spark-native
  * form of the reference's quality report (`multi_source_ingestion_dag
  * .py:323-356`), which re-counted what it had just written.
  *
  * `observe` attaches named aggregate expressions to the plan itself:
  * they accumulate ON THE SIDE of whatever single action the caller
  * runs (a write, a count, a collect) and cost zero extra scans —
  * at 100 TB the difference between "quality report" and "the whole
  * job again". Because the metrics are computed from the exact rows
  * the action saw, they also can't drift from the written output the
  * way a recount can when the source moved between job and audit.
  *
  * Only fully-aggregating expressions are legal (Spark enforces:
  * aggregates over the whole frame, no grouping); that is precisely
  * the quality-report shape — counts, conditional counts, sums,
  * extrema.
  */
object Observed {

  /** Attach `metrics` (named aggregate columns) to `df` under a fresh
    * observation. Returns the instrumented frame and the handle;
    * run exactly ONE action on the returned frame, then read
    * [[metricsRow]] / [[metricsDf]] from the handle. */
  def attach(df: DataFrame, name: String, metrics: Seq[Column])
      : (DataFrame, Observation) = {
    require(metrics.nonEmpty, "need at least one metric expression")
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.drop(1): _*), obs)
  }

  /** The observed metrics as a one-row DataFrame with the declared
    * column order (`Observation.get` is an unordered map; `names`
    * restores the caller's order). Long and Double metrics supported —
    * the quality-report types. Call AFTER the action completed. */
  def metricsDf(spark: SparkSession, obs: Observation,
      names: Seq[String]): DataFrame = {
    val m = obs.get
    val missing = names.filterNot(m.contains)
    require(missing.isEmpty, s"metrics never materialized: $missing " +
      "(did the action run on the instrumented frame?)")
    val fields = names.map { n =>
      m(n) match {
        case _: java.lang.Long | _: java.lang.Integer =>
          StructField(n, LongType, nullable = false)
        case _: java.lang.Double => StructField(n, DoubleType,
          nullable = false)
        case other => throw new IllegalArgumentException(
          s"unsupported metric type for '$n': ${other.getClass}")
      }
    }
    val row = Row.fromSeq(names.map { n =>
      m(n) match {
        case i: java.lang.Integer => i.longValue(): java.lang.Long
        case v => v
      }
    })
    spark.createDataFrame(Seq(row).asJava, StructType(fields))
  }
}
