package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** K-side LIVE wire: a distributed JDBC UPSERT sink.
  *
  * The reference's loaders speak `to_sql` to a real PostgreSQL
  * (`base_loaders.py:56-59`) and its upsert path re-reads + rewrites
  * (`base_loaders.py:80-118`). Spark's built-in JDBC writer only
  * supports append/overwrite — no keyed merge — so this sink is the
  * missing production piece: each PARTITION opens one connection and
  * runs batched UPDATE-then-INSERT (the portable upsert loop; MERGE
  * syntax differs per dialect, but `executeBatch` update counts are
  * JDBC-standard), so the merge distributes across the cluster with
  * per-partition batching instead of collecting to the driver.
  *
  * Contract: `df` must hold AT MOST ONE row per key tuple (reduce to
  * latest-per-key first) and be partitioned BY the key columns when
  * keys could repeat across partitions (`upsert` enforces the
  * repartition) — then no two tasks ever touch the same key, so the
  * update/insert pair cannot race itself and the operation is
  * idempotent: replaying a micro-batch converges to the same state,
  * which is what makes the streaming wiring below exactly-once from
  * the reader's checkpoint + this sink's idempotence.
  *
  * Live-judged against embedded Derby (`stream_jdbc_upsert`); any
  * production driver swaps in via the same (url, driver) pair.
  */
object JdbcSink {

  /** Ensure `table` exists with `schema` (created with the key as
    * PRIMARY KEY) and, when `reset`, clear it — the deterministic
    * starting state a judged query needs on re-runs. */
  def ensureTable(url: String, driver: String, table: String,
      schema: StructType, keyCols: Seq[String],
      reset: Boolean = false): Unit = {
    Class.forName(driver)
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      val exists =
        try { st.executeQuery(s"SELECT 1 FROM $table WHERE 1=0"); true }
        catch { case _: java.sql.SQLException => false }
      if (!exists) {
        val cols = schema.fields.map(f =>
          s"${f.name} ${sqlType(f.dataType)}").mkString(", ")
        st.execute(s"CREATE TABLE $table ($cols, " +
          s"PRIMARY KEY (${keyCols.mkString(", ")}))")
      } else if (reset) st.execute(s"DELETE FROM $table"): Unit
    } finally conn.close()
  }

  private def sqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    case DateType => "DATE"
    case StringType => "VARCHAR(1024)"
    case other => throw new IllegalArgumentException(
      s"unsupported JDBC sink type: $other")
  }

  /** Distributed keyed upsert: repartition by key (one key = one task,
    * see contract above), then per partition run one batched UPDATE
    * pass and INSERT exactly the rows whose update count was 0. */
  def upsert(df: DataFrame, url: String, driver: String, table: String,
      keyCols: Seq[String], batchSize: Int = 500): Unit = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val cols = df.schema.fieldNames.toSeq
    require(keyCols.forall(cols.contains), s"keys $keyCols not in $cols")
    val valCols = cols.filterNot(keyCols.contains)
    require(valCols.nonEmpty, "upsert needs at least one non-key column")
    val updateSql = s"UPDATE $table SET " +
      valCols.map(c => s"$c = ?").mkString(", ") +
      " WHERE " + keyCols.map(c => s"$c = ?").mkString(" AND ")
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val schema = df.schema
    df.repartition(keyCols.map(col): _*).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.nonEmpty) {
          Class.forName(driver)
          val conn = DriverManager.getConnection(url)
          try {
            conn.setAutoCommit(false)
            val upd = conn.prepareStatement(updateSql)
            val ins = conn.prepareStatement(insertSql)
            rows.grouped(batchSize).foreach { group =>
              val buf = group.toIndexedSeq
              buf.foreach { r =>
                var i = 1
                valCols.foreach { c =>
                  setParam(upd, i, r, schema.fieldIndex(c)); i += 1 }
                keyCols.foreach { c =>
                  setParam(upd, i, r, schema.fieldIndex(c)); i += 1 }
                upd.addBatch()
              }
              val counts = upd.executeBatch()
              // crash window: updates staged (uncommitted), inserts not
              graft.Failpoints.point("jdbc.upsert.updates_staged")
              buf.zip(counts).collect { case (r, 0) => r }.foreach { r =>
                cols.zipWithIndex.foreach { case (c, i) =>
                  setParam(ins, i + 1, r, schema.fieldIndex(c)) }
                ins.addBatch()
              }
              ins.executeBatch()
              conn.commit()
              // crash window: this group committed, later groups not
              graft.Failpoints.point("jdbc.upsert.group_committed")
            }
          } finally {
            // a mid-transaction failure must surface AS ITSELF: close()
            // on an open transaction throws (Derby: "Cannot close a
            // connection while a transaction is still active"), which
            // would suppress the real error and leak the transaction —
            // roll back first, and never let cleanup mask the cause
            try {
              if (!conn.isClosed) {
                if (!conn.getAutoCommit) conn.rollback()
                conn.close()
              }
            } catch { case _: java.sql.SQLException => () }
          }
        }
    }
  }

  private def setParam(ps: PreparedStatement, pos: Int,
      r: org.apache.spark.sql.Row, fieldIdx: Int): Unit =
    if (r.isNullAt(fieldIdx)) ps.setObject(pos, null)
    else ps.setObject(pos, r.get(fieldIdx))

  /** Read-back probe for specs/judged queries: total rows in `table`. */
  def count(url: String, driver: String, table: String): Long = {
    Class.forName(driver)
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement()
        .executeQuery(s"SELECT count(*) FROM $table")
      rs.next()
      rs.getLong(1)
    } finally conn.close()
  }
}
