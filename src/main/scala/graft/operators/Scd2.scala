package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history from a change log.
  *
  * The reference's upsert (`base_loaders.py:149-181`) keeps only the
  * latest version of each key; a lake at scale usually also wants the
  * full change history (Delta CDF / classic Kimball SCD2). This builds
  * it from an append-only change log in one pass:
  *
  *   1. order each key's changes by (ts, tie-breaker);
  *   2. keep only rows whose tracked attributes actually differ from
  *      the previous row (null-safe struct compare — interior NULL
  *      attribute values are respected, and consecutive identical
  *      states collapse to one version);
  *   3. stamp `valid_from` / `valid_to` / `version` / `is_current`,
  *      with the open-ended high-date sentinel 9999-12-31 so the
  *      current row carries a real timestamp (range predicates like
  *      `BETWEEN valid_from AND valid_to` need no null handling).
  *
  * Scale shape: ONE hash exchange on the key and ONE sort serve both
  * windows — the change filter preserves the partitioning and the
  * ordering, so Catalyst plans lag + filter + lead + row_number over a
  * single shuffle (asserted in PlanSpec). At 100 TB the cost is the
  * same as any keyed window: a full shuffle of the log, no joins, no
  * second pass.
  */
object Scd2 {

  val OpenEnded = "9999-12-31 00:00:00"

  /** @param log   append-only change log
    * @param key   natural key column
    * @param ts    change timestamp column
    * @param tie   deterministic tie-breaker for equal timestamps
    * @param attrs tracked attribute columns (a new version opens when
    *              any of them changes)
    */
  def fromChangeLog(log: DataFrame, key: String, ts: String, tie: String,
      attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts).asc, col(tie).asc)
    val state = struct(attrs.map(col): _*)
    val changed = log
      .withColumn("__prev", lag(state, 1).over(w))
      // IS DISTINCT FROM: first row (prev null) opens a version; a
      // repeat of the same state (incl. NULL attrs matching) does not
      .filter(!(col("__prev") <=> state))
      .drop("__prev")
    changed
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to",
        coalesce(lead(col(ts), 1).over(w), to_timestamp(lit(OpenEnded))))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current",
        col("valid_to") === to_timestamp(lit(OpenEnded)))
  }
}
