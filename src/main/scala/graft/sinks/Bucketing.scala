package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed lake tables: the co-location layout for keys that are
  * joined or aggregated REPEATEDLY (fact-to-fact joins, daily
  * merge-into-master, per-key sessionization). Hash-bucketing both
  * sides of a join on the same key into the same bucket count makes the
  * join shuffle-FREE on every subsequent query — at 100 TB the shuffle
  * is the dominant cost of a large-large join, and unlike a broadcast
  * it doesn't require either side to be small.
  *
  * Spark specifics encoded here:
  *  - bucketed layout only round-trips through the catalog
  *    (`saveAsTable`); a plain parquet path write drops bucket metadata,
  *    so the API takes table names, with an optional explicit path to
  *    keep data in the lake rather than the warehouse dir;
  *  - both join sides must share bucket count and key for the
  *    exchange-free plan (one-side-bucketed still halves the shuffle);
  *  - `sortBy` within buckets additionally removes the per-task Sort
  *    from sort-merge joins and enables range-pruned point lookups;
  *  - bucket pruning applies equality filters on the bucket key to skip
  *    whole buckets at scan time.
  *
  * Reference context: the reference's postgres loader leans on the
  * database's own btree for repeated-merge performance
  * (`postgres_connector.py:114-121` batched multi-row inserts); a lake
  * engine gets the equivalent amortization from the bucketed layout.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally bucket-sorted) table. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
      buckets: Int, sortCols: Seq[String] = Nil,
      path: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    var w = df.write.mode(mode).format("parquet")
      .bucketBy(buckets, keyCol)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    path.foreach(p => w = w.option("path", p))
    w.saveAsTable(table)
  }

  /** Read a bucketed table back with its bucket metadata intact. */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Co-located equi-join of two tables bucketed on the same key with
    * the same bucket count. With matching layouts Catalyst plans a
    * sort-merge join with NO Exchange on either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, keyCol: String,
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable), Seq(keyCol), joinType)
}
