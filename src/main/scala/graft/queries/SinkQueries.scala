package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sinks.Sinks

/** Sink operators (SURVEY.md §2.2) as judged queries: the *plans*
  * behind the writers — merge, points reshape, routing partitioning,
  * delete filtering — verified against ANSI SQL, plus READ-BACK
  * judgments of the write paths themselves (K1 append/replace,
  * K6 parquet/json/csv round-trip, compaction, versioning, ledger).
  * The remaining write/stats surfaces (K2/K3/K7/K10) are exercised in
  * SinksSpec round-trips.
  */
object SinkQueries extends QuerySection {
  import Catalog.Q

  /** K4 upsert merge plan: updates modify every 10th customer's balance
    * and add new synthetic customers; full-outer merge with update-wins
    * column precedence plus insert/update markers. */
  private def k4UpsertMerge(s: SparkSession, dir: String): DataFrame = {
    val target = Tables.load(s, dir, "customer")
    val modified = target.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        round(col("c_acctbal") + 100, 2).as("c_acctbal"),
        col("c_mktsegment"))
    val inserts = target.filter(col("c_custkey") % 97 === 0)
      .select((col("c_custkey") + 1000000).as("c_custkey"),
        concat(lit("New#"), col("c_name")).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    val updates = modified.unionByName(inserts)
    Sinks.mergeFrames(target, updates, "c_custkey")
      .select(col("c_custkey"), col("c_name"),
        round(col("c_acctbal"), 2).as("c_acctbal"),
        col("__is_insert"), col("__is_update"))
      .orderBy(col("c_custkey"))
  }

  /** K5 points reshape: record → long-format measurement points with
    * declared tag/field columns. */
  private def k5PointsLong(s: SparkSession, dir: String): DataFrame =
    Sinks.pointsFrame(
      Tables.load(s, dir, "orders").filter(col("o_orderkey") < 200),
      measurement = "orders", timeField = "o_orderdate",
      tagFields = Seq("o_orderstatus"), fieldFields = Seq("o_totalprice"))
      .orderBy(col("time"), col("value"), col("tag_o_orderstatus"))

  /** K8 routing partitioning: per-route row counts from the standard
    * routing predicates over a `_source`-tagged stream. */
  private def k8RoutingCounts(s: SparkSession, dir: String): DataFrame = {
    val tagged = Tables.load(s, dir, "events")
      .withColumn("_source",
        when(col("event_type") === "purchase", "transactions")
          .when(col("event_type") === "click", "user_profiles")
          .when(col("event_type") === "error", "logs")
          .when(col("event_type") === "signup", "users")
          .otherwise("events"))
    val routeAggs = Sinks.routePatterns.map { case (name, pat) =>
      sum(when(col("_source").rlike(pat), 1L).otherwise(0L)).as(name)
    } :+ count(lit(1)).as("archive")
    tagged.agg(routeAggs.head, routeAggs.tail: _*)
  }

  /** K9 time-range delete plan: rows kept vs deleted for `[start, stop)`
    * — the filter side of the read-filter-overwrite rewrite. */
  private def k9DeleteRange(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val inRange = col("ts") >= lit("2024-01-10 00:00:00") &&
      col("ts") < lit("2024-01-20 00:00:00")
    ev.agg(
      sum(when(inRange, 1L).otherwise(0L)).as("n_deleted"),
      sum(when(!inRange, 1L).otherwise(0L)).as("n_kept"))
  }

  /** K20 versioned time travel READ-BACK (pattern: stream_routing —
    * write for real, read back, judge the deterministic result): three
    * commits (base / balance update / key delete) land as `v=0..2`;
    * each is then read back BY VERSION and aggregated. Equal hashes
    * prove every historical version is reproduced exactly — the
    * "corpus exactly as sampled last month" guarantee. */
  private def kVersionedTt(s: SparkSession, dir: String): DataFrame = {
    val path = graft.etl.Utils.tempDir("graft_vtt").toString + "/t"
    val base = Tables.load(s, dir, "customer")
      .filter(col("c_custkey") < 100)
      .select(col("c_custkey"), col("c_acctbal"))
    val updated = base.withColumn("c_acctbal",
      when(col("c_custkey") % 10 === 0, round(col("c_acctbal") + 100, 2))
        .otherwise(col("c_acctbal")))
    val trimmed = base.filter(col("c_custkey") < 50)
    Seq(base, updated, trimmed).foreach(Sinks.Versioned.write(_, path))
    val perVersion = Sinks.Versioned.versions(path).map { v =>
      Sinks.Versioned.read(s, path, Some(v))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("c_acctbal")), 2).as("bal_sum"))
        .select(lit(v).as("version"), col("n_rows"), col("bal_sum"))
    }
    perVersion.reduce(_.unionByName(_)).orderBy(col("version"))
  }

  /** K20b versioned DIFF read-back: two commits with planted change
    * classes — balances bumped for `custkey % 10 = 0` (changed), keys
    * < 10 dropped (removed), keys + 1000 inserted (added) — then
    * `Versioned.diff` classifies every key, judged against the same
    * classification computed directly from the source table. */
  private def kVersionedDiff(s: SparkSession, dir: String): DataFrame = {
    val path = graft.etl.Utils.tempDir("graft_vdiff")
      .toString + "/t"
    val base = Tables.load(s, dir, "customer")
      .filter(col("c_custkey") < 100)
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    val next = base.filter(col("c_custkey") >= 10)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 10 === 0, round(col("c_acctbal") + 100, 2))
          .otherwise(col("c_acctbal")))
      .unionByName(base.filter(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + 1000).as("c_custkey"),
          col("c_acctbal"), col("c_mktsegment")))
    Sinks.Versioned.write(base, path)
    Sinks.Versioned.write(next, path)
    Sinks.Versioned.diff(s, path, "c_custkey", 0L, 1L)
      .orderBy(col("c_custkey"))
  }

  /** K9b key-list (erasure) delete READ-BACK: copy events to a scratch
    * table, erase every row for the key list `user_id % 13 = 0`, then
    * judge what the REWRITTEN table contains (plus the writer's own
    * deleted-count) against the anti-join oracle. */
  private def k9bDeleteKeys(s: SparkSession, dir: String): DataFrame = {
    val path = graft.etl.Utils.tempDir("graft_delk").toString + "/t"
    val ev = Tables.load(s, dir, "events")
    ev.write.parquet(path)
    val erasure = ev.filter(col("user_id") % 13 === 0)
      .select(col("user_id")).distinct()
    val nDeleted = Sinks.deleteKeys(s, path, "user_id", erasure)
    val back = s.read.parquet(path)
    back.agg(
      count(lit(1)).as("n_kept"),
      countDistinct(col("user_id")).as("n_users_kept"))
      .select(lit(nDeleted).as("n_deleted"), col("n_kept"),
        col("n_users_kept"))
  }

  /** K19 exactly-once ledger READ-BACK: a deliberately NON-idempotent
    * append writer wrapped in the per-batchId ledger; batch 0 is
    * delivered, batch 1 is delivered, then batch 0 is REPLAYED (what
    * Structured Streaming does after a crash between write and commit).
    * The read-back per-batch counts match single delivery — the replay
    * was skipped by the marker, not deduplicated by luck. */
  private def kLedger(s: SparkSession, dir: String): DataFrame = {
    val root = graft.etl.Utils.tempDir("graft_ledger").toString
    val out = s"$root/out"
    val ev = Tables.load(s, dir, "events")
    def batch(b: Int): DataFrame =
      ev.filter(col("user_id") % 3 === b).withColumn("batch", lit(b.toLong))
    val writer = Sinks.exactlyOnce(s"$root/ledger") { (df, _) =>
      df.write.mode("append").parquet(out)
    }
    writer(batch(0), 0L)
    writer(batch(1), 1L)
    writer(batch(0), 0L) // replay — must be a no-op
    s.read.parquet(out).groupBy(col("batch"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("batch"))
  }

  /** K12 compaction READ-BACK: a 64-small-file layout compacts to one
    * target-sized file with provably identical content (order-
    * independent checksum equality before/after, judged as a boolean
    * alongside the deterministic file counts). */
  /** K1 READ-BACK, judged: `Sinks.load`'s append/replace contract
    * proven on lake files, not just spec'd — phase 1 replaces with
    * p_size ≤ 10, phase 2 APPENDS (11, 20], phase 3 REPLACES with
    * p_size in [5, 8] (the append history must vanish). Each phase's
    * row is the READ-BACK aggregate plus the row count `load` itself
    * observed during the write (`n_loaded` — Dataset.observe, no
    * re-scan); the oracle recomputes every number from `part`, so a
    * replace that leaked old files or an append that clobbered would
    * hash-mismatch. */
  private def k1AppendReplace(s: SparkSession, dir: String): DataFrame = {
    val path = graft.etl.Utils.tempDir("graft_k1").toString + "/t"
    val part = Tables.load(s, dir, "part")
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
    // snapshots collect EAGERLY: each read-back must see the table as
    // it stood after ITS phase — a lazy plan would observe (or trip
    // over missing files from) the later replaces
    def snapshot(phase: String, nLoaded: Long): (String, Long, Long, Long) = {
      val r = s.read.parquet(path).agg(
        count(lit(1)),
        sum(round(col("p_retailprice") * 100).cast("long"))).collect()(0)
      (phase, r.getLong(0), nLoaded, r.getLong(1))
    }
    val a = snapshot("1_replace",
      Sinks.load(part.filter(col("p_size") <= 10), path,
        ifExists = "replace"))
    val b = snapshot("2_append",
      Sinks.load(part.filter(col("p_size") > 10 && col("p_size") <= 20),
        path, ifExists = "append"))
    val c = snapshot("3_replace",
      Sinks.load(part.filter(col("p_size").between(5, 8)), path,
        ifExists = "replace"))
    import s.implicits._
    Seq(a, b, c).toDF("phase", "n_rows", "n_loaded", "price_cents")
      .orderBy(col("phase"))
  }

  /** K6 READ-BACK, judged: one dataset through all three file-sink
    * formats (parquet/json/csv via `Sinks.load`) and back through the
    * matching `Sources.file` readers — the full fidelity loop the
    * reference's `save_to_file`/`read_file` pair implies
    * (`base_loaders.py:281-315`). Money compares in exact integer
    * cents, so csv's text round-trip and json's double parse must
    * reproduce values EXACTLY, not approximately; all three formats
    * must agree with DuckDB reading the original table. */
  private def k6FileRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val base = graft.etl.Utils.tempDir("graft_k6").toString
    val cust = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val out = Seq("parquet", "json", "csv").map { fmt =>
      Sinks.load(cust, s"$base/$fmt", format = fmt, ifExists = "replace")
      // Spark's json sink writes JSON LINES — read back through the
      // ndjson reader, not the whole-file-array one
      val readFmt = if (fmt == "json") "jsonl" else fmt
      graft.sources.Sources.file(s, s"$base/$fmt", Some(readFmt))
        .groupBy(lit(fmt).as("format"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("c_mktsegment")).as("n_segments"),
          sum(round(col("c_acctbal") * 100).cast("long")).as("bal_cents"))
    }
    out.reduce(_ unionByName _).orderBy(col("format"))
  }

  private def kCompaction(s: SparkSession, dir: String): DataFrame = {
    val path = graft.etl.Utils.tempDir("graft_cmp").toString + "/t"
    val ev = Tables.load(s, dir, "events")
    ev.repartition(64).write.parquet(path)
    val cols = ev.columns.toSeq
    val before = Sinks.contentChecksum(s.read.parquet(path), cols).first()
    val (filesBefore, filesAfter) =
      Sinks.compact(s, path, targetBytes = Long.MaxValue)
    val after = Sinks.contentChecksum(s.read.parquet(path), cols).first()
    import s.implicits._
    Seq((filesBefore.toLong, filesAfter.toLong,
      before.getLong(0) == after.getLong(0) &&
        before.getLong(1) == after.getLong(1),
      after.getLong(0)))
      .toDF("files_before", "files_after", "content_equal", "n_rows")
  }

  /** K21 file-level data skipping READ-BACK
    * (`sources/StatsSkipping.scala`): lineitem is range-clustered on
    * l_shipdate into 16 files with a per-file min/max manifest, then a
    * two-month window is answered from the MANIFEST-PRUNED file list.
    * The judged rows are the window aggregate — identical to a plain
    * full-scan filter (the oracle) — plus the file accounting
    * (16 total / pruned subset read), proving the scan skipped most
    * of the layout without changing the answer. At 100 TB this is the
    * difference between listing 50k files and opening 1k. */
  private def kStatsPrune(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.StatsSkipping
    val path = graft.etl.Utils.tempDir("graft_skip").toString + "/t"
    val li = Tables.load(s, dir, "lineitem")
    StatsSkipping.writeClustered(li, path, "l_shipdate", nFiles = 16,
      manifestCols = Seq("l_shipdate"))
    val lo = java.sql.Timestamp.valueOf("1997-03-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1997-04-30 23:59:59")
    val (kept, total) = StatsSkipping.pruneFiles(s, path, "l_shipdate", lo, hi)
    val window = StatsSkipping.prunedRead(s, path, "l_shipdate", lo, hi)
    window.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .withColumn("files_total", lit(total.toLong))
      // a 2-month window over ~40 months range-clustered into 16 files
      // must land in ≤3 files; the exact count depends on the range
      // sampler's boundaries, so the judged fact is the bound, not the
      // count
      .withColumn("pruned", lit(kept.size <= 3))
      .orderBy(col("l_returnflag"))
  }

  /** K22 DYNAMIC PARTITION OVERWRITE read-back: the
    * reprocess-one-day lake op — an incoming batch carrying only two
    * days replaces EXACTLY those two day-partitions
    * (`partitionOverwriteMode=dynamic`) and must leave every other
    * day byte-untouched; static overwrite mode would have truncated
    * the whole table. Judged on the per-day read-back: the two
    * replayed days carry doubled values, the rest the originals. At
    * 100 TB this is the difference between rewriting 2 partitions and
    * rewriting the lake. */
  private def kDynOverwrite(s: SparkSession, dir: String): DataFrame = {
    val path = graft.etl.Utils.tempDir("graft_dyno").toString + "/t"
    val ev = Tables.load(s, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.partitionBy("day").parquet(path)
    val redo = Seq("2024-01-05", "2024-01-10")
    ev.filter(col("day").isin(redo: _*))
      .withColumn("value", col("value") * 2)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(path)
    s.read.parquet(path)
      // partition-column type inference reads the day string back as a
      // timestamp; re-format for the hash-stable export
      .groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy(col("day"))
  }

  /** O2 flagship ETL job end-to-end (src/api/main.py:224-280): extract
    * events → clean → validate (value range) → route valid/invalid to
    * lake paths → report per-route loaded counts. The judged output is
    * the deterministic count row; the writes go to a temp dir. */
  private def o2EtlJob(s: SparkSession, dir: String): DataFrame = {
    import graft.etl.EtlJob
    import graft.transform.{FieldRule, Stamp}
    val out = graft.etl.Utils.tempDir("graft_etl_q").toString
    val job = EtlJob(
      source = sp => Tables.load(sp, dir, "events")
        .withColumn("_source", lit("events")),
      transformations = Seq("cleaning", "validation"),
      validationRules = Map("value" -> FieldRule(min = Some(5), max = Some(80))),
      routes = Seq(
        Sinks.Route("valid", col("_is_valid"),
          d => Sinks.load(d.drop("_validation_errors"), s"$out/valid")),
        Sinks.Route("invalid", !col("_is_valid"),
          d => Sinks.load(d.drop("_validation_errors"), s"$out/invalid")),
        Sinks.Route("archive", lit(true),
          d => Sinks.load(d.drop("_validation_errors"), s"$out/archive"))),
      stamp = Stamp.off)
    val r = job.run(s)
    import s.implicits._
    Seq((
      r.loadResults("valid").count,
      r.loadResults("invalid").count,
      r.loadResults("archive").count,
      r.stageErrors.size.toLong
    )).toDF("n_valid", "n_invalid", "n_archived", "n_stage_errors")
  }

  /** O2 over the DATA WIRE (the round-10/11 codecs as first-class ETL
    * sources, not just service endpoints): events serialize to
    * canonical Extended JSON text, and the ETL job's source is the
    * config-driven `Sources.file(..., "extendedjson", schema)` wire
    * scan — so extraction itself exercises the typed BSON-wire parse —
    * then the same clean → validate → route pipeline as `o2_etl_job`.
    * Counts must match the source table exactly: the wire leg loses
    * no rows and the parsed `value` column stays numerically intact
    * through the validation predicate. */
  private def o8WireEtl(s: SparkSession, dir: String): DataFrame = {
    import graft.etl.EtlJob
    import graft.sources.{ExtendedJson, Sources}
    import graft.transform.{FieldRule, Stamp}
    val tmp = graft.etl.Utils.tempDir("graft_etl_w")
    val ev = Tables.load(s, dir, "events")
    val stage = tmp.resolve("stage").toString
    ExtendedJson.serialize(ev).write.text(stage)
    val out = tmp.resolve("out").toString
    val job = EtlJob(
      source = sp => Sources.file(sp, stage, Some("extendedjson"),
        Some(ev.schema)).withColumn("_source", lit("events_wire")),
      transformations = Seq("cleaning", "validation"),
      validationRules =
        Map("value" -> FieldRule(min = Some(5), max = Some(80))),
      routes = Seq(
        Sinks.Route("valid", col("_is_valid"),
          d => Sinks.load(d.drop("_validation_errors"), s"$out/valid")),
        Sinks.Route("invalid", !col("_is_valid"),
          d => Sinks.load(d.drop("_validation_errors"), s"$out/invalid")),
        Sinks.Route("archive", lit(true),
          d => Sinks.load(d.drop("_validation_errors"), s"$out/archive"))),
      stamp = Stamp.off)
    val r = job.run(s)
    import s.implicits._
    Seq((
      r.loadResults("valid").count,
      r.loadResults("invalid").count,
      r.loadResults("archive").count,
      r.stageErrors.size.toLong
    )).toDF("n_valid", "n_invalid", "n_archived", "n_stage_errors")
  }

  /** O2 over the OTHER data wire — the Influx line-protocol twin of
    * [[o8WireEtl]], closing the wire-ETL symmetry (VERDICT r11 #4):
    * events serialize to line-protocol text (`event_type` rides as a
    * tag, the rest as typed fields, `ts` as the nanosecond timestamp),
    * and the ETL job's source is the config-driven
    * `Sources.file(..., "lineprotocol")` wire scan — the typed
    * [[graft.sources.LineProtocol.Point]] frame projected back to the
    * flat event shape — then the same clean → validate → route
    * pipeline as `o2_etl_job`/`o8_wire_etl`. Counts must match the
    * source table exactly: the wire leg loses no rows and `value`
    * survives the double round-trip bit-exactly (shortest-repr
    * serialize ↔ parse). */
  private def o9WireEtlLp(s: SparkSession, dir: String): DataFrame = {
    import graft.etl.EtlJob
    import graft.sources.{LineProtocol, Sources}
    import graft.transform.{FieldRule, Stamp}
    val tmp = graft.etl.Utils.tempDir("graft_etl_lp")
    val ev = Tables.load(s, dir, "events")
    val stage = tmp.resolve("stage").toString
    LineProtocol.serialize(ev, "events", timeField = "ts",
      tagFields = Seq("event_type")).write.text(stage)
    val out = tmp.resolve("out").toString
    val job = EtlJob(
      source = sp => Sources.file(sp, stage, Some("lineprotocol"))
        .select(col("fields_long")("event_id").as("event_id"),
          col("time").as("ts"),
          col("fields_long")("user_id").as("user_id"),
          col("tags")("event_type").as("event_type"),
          col("fields_double")("value").as("value"),
          col("fields_str")("props").as("props"))
        .withColumn("_source", lit("events_wire_lp")),
      transformations = Seq("cleaning", "validation"),
      validationRules =
        Map("value" -> FieldRule(min = Some(5), max = Some(80))),
      routes = Seq(
        Sinks.Route("valid", col("_is_valid"),
          d => Sinks.load(d.drop("_validation_errors"), s"$out/valid")),
        Sinks.Route("invalid", !col("_is_valid"),
          d => Sinks.load(d.drop("_validation_errors"), s"$out/invalid")),
        Sinks.Route("archive", lit(true),
          d => Sinks.load(d.drop("_validation_errors"), s"$out/archive"))),
      stamp = Stamp.off)
    val r = job.run(s)
    import s.implicits._
    Seq((
      r.loadResults("valid").count,
      r.loadResults("invalid").count,
      r.loadResults("archive").count,
      r.stageErrors.size.toLong
    )).toDF("n_valid", "n_invalid", "n_archived", "n_stage_errors")
  }

  /** K7: multi-target load — same events scan fanned to a parquet and a
    * json sink (one persist, two writes); judged output is the
    * per-target result map. */
  private def k7MultiTarget(s: SparkSession, dir: String): DataFrame = {
    val out = graft.etl.Utils.tempDir("graft_k7").toString
    val results = Sinks.multiTarget(
      Tables.load(s, dir, "events"),
      Seq(
        "json_copy" -> ((d: org.apache.spark.sql.DataFrame) =>
          Sinks.load(d, s"$out/json_copy", format = "json")),
        "parquet_copy" -> ((d: org.apache.spark.sql.DataFrame) =>
          Sinks.load(d, s"$out/parquet_copy"))))
    import s.implicits._
    results.toSeq.map { case (name, r) => (name, r.status, r.count) }
      .toDF("target", "status", "n").orderBy(col("target"))
  }

  /** K11 (scale extension): bucketed co-located join. Orders and
    * lineitem are written bucketed on the join key with matching bucket
    * counts, then joined and aggregated — the bucketed layout makes both
    * the join and the groupBy shuffle-free (asserted in BucketingSpec);
    * this query proves the layout also returns exactly the shuffled
    * plan's answer. */
  private def kBucketedJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.sinks.Bucketing
    val out = graft.etl.Utils.tempDir("graft_bkt").toString
    // the two bucketed table writes are independent (distinct catalog
    // names, distinct paths): overlap them (guide §2.6)
    graft.etl.Utils.inParallel(
      () => Bucketing.writeBucketed(
        Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice")),
        "graft_b_orders", "o_orderkey", 8, sortCols = Seq("o_orderkey"),
        path = Some(s"$out/orders")),
      () => Bucketing.writeBucketed(
        Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
        "graft_b_lineitem", "o_orderkey", 8, sortCols = Seq("o_orderkey"),
        path = Some(s"$out/lineitem")))
    Bucketing.bucketedJoin(s, "graft_b_orders", "graft_b_lineitem",
        "o_orderkey")
      .groupBy(col("o_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(max(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_orderkey")).limit(200)
  }

  /** K+ (scale extension): dynamic partition pruning over the
    * date-partitioned lake layout. The fact is written partitioned by
    * ship month — the layout `Sinks.loadPartitionedByDate` targets —
    * then joined to a dimension whose qualifying months are only known
    * at runtime (distinct order months of one quarter). DPP compiles
    * the dim filter into a partition-level subquery on the fact scan
    * (`dynamicpruningexpression` in PartitionFilters, asserted in
    * PlanSpec), so a 100 TB fact reads only the matched partitions
    * instead of all of them — the difference between scanning 3 months
    * and scanning 7 years. */
  private def kDppJoin(s: SparkSession, dir: String): DataFrame = {
    val out = graft.etl.Utils.tempDir("graft_dpp").toString
    Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      // co-locate each month before the partitioned write: one file per
      // partition instead of (tasks × months) small files
      .repartition(col("ship_month"))
      .write.mode("overwrite").partitionBy("ship_month").parquet(out)
    val fact = s.read.parquet(out)
    val dim = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01") &&
        col("o_orderdate") < lit("1997-04-01"))
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("ship_month"))
      .distinct()
    fact.join(dim, Seq("ship_month"))
      .groupBy(col("ship_month"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("ship_month"))
  }

  /** K+ (lake lifecycle past K4's latest-wins upsert): SCD2 change
    * history. `orders` is treated as the change log of each customer's
    * order status; `Scd2.fromChangeLog` collapses consecutive repeats
    * of the same status and stamps versioned validity ranges — the
    * full-history twin of the upsert, one keyed shuffle total
    * (asserted in PlanSpec). Validity bounds are exported as epoch
    * microseconds (`unix_micros` here, `epoch_us` in the oracle): the
    * open-ended 9999-12-31 sentinel is outside the ns-precision
    * datetime range (max 2262-04-11), so a raw timestamp column would
    * decode differently in any ns-based comparison bridge even though
    * both engines hold the same instant. */
  private def kScd2History(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scd2.fromChangeLog(
        Tables.load(s, dir, "orders"),
        key = "o_custkey", ts = "o_orderdate", tie = "o_orderkey",
        attrs = Seq("o_orderstatus"))
      .select(col("o_custkey"), col("version").cast("long").as("version"),
        col("o_orderstatus").as("status"),
        // the lake stores NTZ timestamps; session TZ is pinned UTC, so
        // the cast is instant-preserving and unix_micros is well-defined
        unix_micros(col("valid_from").cast("timestamp")).as("valid_from_us"),
        unix_micros(col("valid_to").cast("timestamp")).as("valid_to_us"),
        col("is_current"))
      .orderBy(col("o_custkey"), col("version"))

  /** K+ (layout): z-order clustered rewrite, read back through a 2-D
    * predicate box. The aggregate proves the Morton-curve rewrite is
    * lossless; the skipping property (few file bounding boxes overlap
    * the box) is asserted in ZOrderSpec. On the 100 TB table this
    * layout lets Parquet footer stats prune both dimensions at once. */
  private def kZorderBox(s: SparkSession, dir: String): DataFrame = {
    val out = graft.etl.Utils.tempDir("graft_zq").toString
    graft.sinks.ZOrder.write(
      Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice")),
      out, Seq("l_partkey", "l_suppkey"), numFiles = 16)
    s.read.parquet(out)
      .filter(col("l_partkey").between(400, 800) &&
        col("l_suppkey").between(20, 60))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("l_suppkey"))
  }

  /** K+ (maintenance): order-independent table content checksum —
    * judged against DuckDB computing the identical md5-bridge sum, so
    * the fingerprint is provably engine-portable (the property that
    * makes it usable for cross-system lake sync validation). */
  private def kChecksum(s: SparkSession, dir: String): DataFrame =
    Sinks.contentChecksum(Tables.load(s, dir, "customer"),
      Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))

  /** O+ — incrementally maintained daily rollup (the production form
    * of the reference's hourly DAG): two bookmark-gated cycles fold
    * additive partials into the rollup table, and the judged result
    * must equal the one-shot aggregate over all history — proving no
    * event is double-counted (bookmark is strict) and none is skipped,
    * without ever rescanning history. */
  private def o3IncrementalRollup(s: SparkSession, dir: String): DataFrame = {
    val out = graft.etl.Utils.tempDir("graft_incr")
      .toString + "/rollup"
    val events = Tables.load(s, dir, "events")
    val bm1 = graft.etl.Incremental.dailyEventRollup(s,
      events.filter(col("ts") < lit("2024-01-15")), out, bookmark = None)
    graft.etl.Incremental.dailyEventRollup(s, events, out, bm1)
    s.read.parquet(out)
      .select(col("day"), col("event_type"), col("n"),
        round(col("total"), 2).as("total"))
      .orderBy(col("day"), col("event_type"))
  }

  /** O+ — backfill repair: the rollup is deliberately CORRUPTED (the
    * mid-January batch folded twice — the classic double-applied
    * increment) and then repaired by recomputing exactly that day range
    * from source. Judged against the one-shot aggregate: the repair
    * must restore every corrupted day and must not touch any other. */
  private def o4BackfillRepair(s: SparkSession, dir: String): DataFrame = {
    val out = graft.etl.Utils.tempDir("graft_bf")
      .toString + "/rollup"
    val events = Tables.load(s, dir, "events")
    graft.etl.Incremental.dailyEventRollup(s, events, out, bookmark = None)
    // corrupt: fold days 10-14 a second time
    val dup = events.filter(
      date_format(col("ts"), "yyyy-MM-dd").between("2024-01-10", "2024-01-14"))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
    graft.etl.Incremental.mergeAdditive(s, out, dup, Seq("day", "event_type"))
    // repair exactly that range
    graft.etl.Incremental.backfillDailyRollup(s, events, out,
      "2024-01-10", "2024-01-14")
    s.read.parquet(out)
      .select(col("day"), col("event_type"), col("n"),
        round(col("total"), 2).as("total"))
      .orderBy(col("day"), col("event_type"))
  }

  /** K-WAP — write-audit-publish (`Sinks.writeAuditPublish`): a
    * corrupted candidate (planted negative-value rows) is staged,
    * audited AGAINST THE STAGED FILES, vetoed — the live table must
    * stay untouched — then the clean candidate passes and publishes
    * via atomic swap. The judged read-back aggregates the PUBLISHED
    * table: only the clean rows can be present, and the first
    * (pre-veto) publish of the base frame must have survived the
    * failed attempt in between. */
  private def kWap(s: SparkSession, dir: String): DataFrame = {
    val path = graft.etl.Utils.tempDir("graft_wap")
      .toString + "/events_clean"
    val events = Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    def audit(staged: DataFrame): Option[String] = {
      val bad = staged.filter(col("value") < 0).count()
      if (bad > 0) Some(s"$bad negative-value rows") else None
    }
    // publish 1: the real table passes
    val first = graft.sinks.Sinks.writeAuditPublish(s, events, path, audit)
    require(first.isRight, s"clean publish vetoed: $first")
    // publish 2: a corrupted candidate must be vetoed, live table kept
    val corrupted = events.unionByName(
      events.limit(5).withColumn("value", lit(-1.0)))
    val second = graft.sinks.Sinks.writeAuditPublish(s, corrupted, path, audit)
    require(second.isLeft, "corrupted publish was not vetoed")
    s.read.parquet(path)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy(col("event_type"))
  }

  /** O5 — incrementally maintained MV over the FULL mergeable-aggregate
    * algebra (`Incremental.mergeMergeable`): a per-(priority, status)
    * order summary holding count, sum, min and max is built from the
    * first half of orders and then maintained with two delta folds
    * (second half split again, proving fold order doesn't matter);
    * avg is derived at read time from the stored sum+count. Judged
    * against the one-shot aggregate over all orders — the increments
    * must reconstruct it exactly, including the semilattice (min/max)
    * columns the additive-only rollup (O3) can't carry. At 100 TB each
    * fold touches one batch + the aggregate-cardinality rollup. */
  /** O7 — append-only incremental JOIN-MV maintenance
    * (`Incremental.mergeJoinMv`): customers and orders are each split
    * into an "old" snapshot and an insert delta; the maintained
    * denormalized view starts as old ⋈ old and appends the three
    * delta-join terms (ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB) — the full tables are
    * never re-joined. Judged against the oracle's FULL customer ⋈
    * orders recompute: the delta algebra must reconstruct it
    * hash-exactly. At 100 TB each batch costs Θ(|Δ|·fan-out), not
    * |A ⋈ B|; deltas broadcast. */
  private def o7JoinMvDelta(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    val ord = Tables.load(s, dir, "orders")
      .select(col("o_custkey").as("custkey"), col("o_orderkey"),
        col("o_totalprice"))
    val aOld = cust.filter(col("custkey") % 10 =!= 0)
    val aDelta = cust.filter(col("custkey") % 10 === 0)
    val bOld = ord.filter(col("o_orderkey") % 7 =!= 0)
    val bDelta = ord.filter(col("o_orderkey") % 7 === 0)
    val mv = aOld.join(bOld, Seq("custkey"))
    graft.etl.Incremental
      .mergeJoinMv(mv, aOld, bOld, aDelta, bDelta, Seq("custkey"))
      .select(col("o_orderkey"), col("custkey"), col("c_mktsegment"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("o_orderkey"))
  }

  private def o5MvMerge(s: SparkSession, dir: String): DataFrame = {
    val out = graft.etl.Utils.tempDir("graft_mvm")
      .toString + "/rollup"
    val orders = Tables.load(s, dir, "orders")
    def partial(from: String, until: String): DataFrame = orders
      .filter(col("o_orderdate") >= from && col("o_orderdate") < until)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
    val merges = Seq("n" -> "sum", "total" -> "sum",
      "min_price" -> "min", "max_price" -> "max")
    val keys = Seq("o_orderpriority", "o_orderstatus")
    graft.etl.Incremental.mergeMergeable(s, out,
      partial("0000-01-01", "1998-01-01"), keys, merges)
    graft.etl.Incremental.mergeMergeable(s, out,
      partial("1998-01-01", "2000-01-01"), keys, merges)
    graft.etl.Incremental.mergeMergeable(s, out,
      partial("2000-01-01", "9999-12-31"), keys, merges)
    s.read.parquet(out)
      .select(col("o_orderpriority"), col("o_orderstatus"), col("n"),
        round(col("total"), 2).as("total"),
        round(col("min_price"), 2).as("min_price"),
        round(col("max_price"), 2).as("max_price"),
        round(col("total") / col("n"), 4).as("avg_price"))
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))
  }

  /** Materialized-view rewrite, end to end
    * (`org.apache.spark.sql.graftx.MvRewrite`): a (type, user)
    * summary of events is built and registered, then a COARSER
    * per-type rollup over the BASE table is planned — the optimizer
    * rule re-targets every aggregate onto the summary's partial
    * columns, and the query `require`s the rewrite actually fired
    * (optimized plan scans the summary, not the base). The oracle
    * computes from the base table in DuckDB, proving the rewrite
    * semantically lossless; at 100 TB this is a fact-scan → summary
    * -scan substitution on every matching dashboard rollup. */
  private def mvRewrite(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftx.MvRegistry
    val out = graft.etl.Utils.tempDir("graft_mv").toString
    MvRegistry.clear()
    val base = Tables.load(s, dir, "events")
    MvRegistry.buildSummary(base, s"$out/by_type_user",
      groupCols = Seq("event_type", "user_id"),
      measureCols = Seq("value"))
    val q = base.groupBy(col("event_type"))
      .agg(round(sum(col("value")), 4).as("sum_value"),
        count(col("value")).as("n_values"),
        count(lit(1)).as("n_rows"),
        round(min(col("value")), 4).as("min_value"),
        round(max(col("value")), 4).as("max_value"))
      .orderBy(col("event_type"))
    val roots = MvRegistry.scanRoots(q.queryExecution.optimizedPlan)
    require(roots.exists(_.contains(out)) &&
      !roots.exists(_.contains("events.parquet")),
      s"MV rewrite did not fire; scans = $roots")
    q
  }

  /** The subsumed-filter shape of [[mvRewrite]]: a WHERE on a GROUP
    * column (the dashboard norm) keeps or drops whole summary groups,
    * so the rule replays it over the summary and still fires — the
    * in-query `require` pins that, the base-table oracle pins
    * exactness. */
  private def mvRewriteFiltered(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftx.MvRegistry
    val out = graft.etl.Utils.tempDir("graft_mvf").toString
    MvRegistry.clear()
    val base = Tables.load(s, dir, "events")
    MvRegistry.buildSummary(base, s"$out/by_type_user",
      groupCols = Seq("event_type", "user_id"),
      measureCols = Seq("value"))
    val q = base
      .filter(col("event_type").isin("click", "purchase") &&
        col("user_id") % 2 === 0)
      .groupBy(col("event_type"), col("user_id"))
      .agg(round(sum(col("value")), 4).as("sum_value"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("event_type"), col("user_id"))
      .limit(500)
    val roots = MvRegistry.scanRoots(q.queryExecution.optimizedPlan)
    require(roots.exists(_.contains(out)) &&
      !roots.exists(_.contains("events.parquet")),
      s"MV filtered rewrite did not fire; scans = $roots")
    q
  }

  /** O6 — in-flight quality metrics via `Dataset.observe`
    * ([[graft.etl.Observed]]): the judged row IS the observation
    * output. The ONLY Spark action in this query is the noop write of
    * the instrumented frame — the counts/sums accumulate as a side
    * product of that write, zero extra scans (the reference's quality
    * report re-counted what it had just written; at 100 TB that's the
    * whole job again). `metricsDf` throws if the metrics never
    * materialized, so a green row proves they came from the
    * observation handle, not a recount. */
  private def o6ObservedMetrics(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
    val (instrumented, obs) = graft.etl.Observed.attach(li, "o6_quality",
      Seq(count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity") > 45, 1L).otherwise(0L))
          .as("n_high_qty"),
        sum(col("l_quantity")).as("sum_qty"), // integral doubles: exact
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("n_returned")))
    instrumented.write.format("noop").mode("overwrite").save()
    graft.etl.Observed.metricsDf(s, obs,
      Seq("n_rows", "n_high_qty", "sum_qty", "n_returned"))
  }

  def queries: Map[String, Q] = Map(
    "o6_observed_metrics" -> (o6ObservedMetrics _),
    "mv_rewrite" -> (mvRewrite _),
    "mv_rewrite_filtered" -> (mvRewriteFiltered _),
    "o4_backfill_repair" -> (o4BackfillRepair _),
    "o5_mv_merge" -> (o5MvMerge _),
    "o7_join_mv_delta" -> (o7JoinMvDelta _),
    "k_wap" -> (kWap _),
    "o3_incremental_rollup" -> (o3IncrementalRollup _),
    "k_checksum" -> (kChecksum _),
    "k_zorder_box" -> (kZorderBox _),
    "k_scd2_history" -> (kScd2History _),
    "k_dpp_join" -> (kDppJoin _),
    "k_bucketed_join" -> (kBucketedJoin _),
    "o2_etl_job" -> (o2EtlJob _),
    "o8_wire_etl" -> (o8WireEtl _),
    "o9_wire_etl_lp" -> (o9WireEtlLp _),
    "k7_multi_target" -> (k7MultiTarget _),
    "k4_upsert_merge" -> (k4UpsertMerge _),
    "k5_points_long" -> (k5PointsLong _),
    "k8_routing_counts" -> (k8RoutingCounts _),
    "k9_delete_range" -> (k9DeleteRange _),
    "k_versioned_tt" -> (kVersionedTt _),
    "k_versioned_diff" -> (kVersionedDiff _),
    "k9b_delete_keys" -> (k9bDeleteKeys _),
    "k_ledger" -> (kLedger _),
    "k_compaction" -> (kCompaction _),
    "k_stats_prune" -> (kStatsPrune _),
    "k_dyn_overwrite" -> (kDynOverwrite _),
    "k1_append_replace" -> (k1AppendReplace _),
    "k6_file_roundtrip" -> (k6FileRoundtrip _)
  )

  def oracleSql: Map[String, String] = Map(
    "o6_observed_metrics" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_high_qty,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_returned
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'""".stripMargin,
    "mv_rewrite" ->
      """SELECT event_type,
        |  round(sum(value), 4) AS sum_value,
        |  count(value) AS n_values,
        |  count(*) AS n_rows,
        |  round(min(value), 4) AS min_value,
        |  round(max(value), 4) AS max_value
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "mv_rewrite_filtered" ->
      """SELECT event_type, user_id,
        |  round(sum(value), 4) AS sum_value,
        |  count(*) AS n_rows
        |FROM events
        |WHERE event_type IN ('click', 'purchase') AND user_id % 2 = 0
        |GROUP BY 1, 2 ORDER BY event_type, user_id
        |LIMIT 500""".stripMargin,
    "o4_backfill_repair" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "o3_incremental_rollup" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "k_wap" ->
      """SELECT event_type, count(*) AS n,
        |  round(sum(value), 2) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "o7_join_mv_delta" ->
      """SELECT o_orderkey, c_custkey AS custkey, c_mktsegment,
        |  round(o_totalprice, 2) AS price
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "o5_mv_merge" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total,
        |  round(min(o_totalprice), 2) AS min_price,
        |  round(max(o_totalprice), 2) AS max_price,
        |  round(sum(o_totalprice) / count(*), 4) AS avg_price
        |FROM orders GROUP BY 1, 2
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    "k_checksum" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CAST('0x' || substr(md5(
        |      coalesce(CAST(c_custkey AS VARCHAR), '<NULL>') || '|' ||
        |      coalesce(c_name, '<NULL>') || '|' ||
        |      coalesce(CAST(c_nationkey AS VARCHAR), '<NULL>') || '|' ||
        |      coalesce(c_mktsegment, '<NULL>')
        |    ), 1, 15) AS BIGINT) % 1000000007) AS BIGINT) AS checksum
        |FROM customer""".stripMargin,
    "k_zorder_box" ->
      """SELECT l_suppkey, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |WHERE l_partkey BETWEEN 400 AND 800
        |  AND l_suppkey BETWEEN 20 AND 60
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "k_scd2_history" ->
      """WITH ordered AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
        |    lag(o_orderstatus) OVER w AS prev
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey)),
        |changes AS (
        |  SELECT * FROM ordered WHERE prev IS DISTINCT FROM o_orderstatus)
        |SELECT o_custkey,
        |  row_number() OVER w AS version,
        |  o_orderstatus AS status,
        |  epoch_us(o_orderdate) AS valid_from_us,
        |  epoch_us(coalesce(lead(o_orderdate) OVER w,
        |           TIMESTAMP '9999-12-31 00:00:00')) AS valid_to_us,
        |  lead(o_orderdate) OVER w IS NULL AS is_current
        |FROM changes
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, version""".stripMargin,
    "k_dpp_join" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
        |  count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |WHERE strftime(l_shipdate, '%Y-%m') IN (
        |  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') FROM orders
        |  WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1997-04-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "k_bucketed_join" ->
      """SELECT o_orderkey,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(max(o_totalprice), 2) AS total
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey ORDER BY o_orderkey LIMIT 200""".stripMargin,
    "k7_multi_target" ->
      """SELECT 'json_copy' AS target, 'success' AS status,
        |  count(*) AS n FROM events
        |UNION ALL
        |SELECT 'parquet_copy', 'success', count(*) FROM events
        |ORDER BY target""".stripMargin,
    "o2_etl_job" ->
      """SELECT
        |  CAST(sum(CASE WHEN value >= 5 AND value <= 80 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_valid,
        |  CAST(sum(CASE WHEN NOT (value >= 5 AND value <= 80) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_invalid,
        |  count(*) AS n_archived,
        |  CAST(0 AS BIGINT) AS n_stage_errors
        |FROM events""".stripMargin,
    // the wire leg must lose no rows and keep `value` exact: counts
    // equal the direct-table job's
    "o8_wire_etl" ->
      """SELECT
        |  CAST(sum(CASE WHEN value >= 5 AND value <= 80 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_valid,
        |  CAST(sum(CASE WHEN NOT (value >= 5 AND value <= 80) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_invalid,
        |  count(*) AS n_archived,
        |  CAST(0 AS BIGINT) AS n_stage_errors
        |FROM events""".stripMargin,
    // the line-protocol leg makes the same promise as o8's extended-
    // JSON leg: no rows lost, `value` numerically intact through the
    // validation predicate — so the oracle is the same direct-table
    // count
    "o9_wire_etl_lp" ->
      """SELECT
        |  CAST(sum(CASE WHEN value >= 5 AND value <= 80 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_valid,
        |  CAST(sum(CASE WHEN NOT (value >= 5 AND value <= 80) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_invalid,
        |  count(*) AS n_archived,
        |  CAST(0 AS BIGINT) AS n_stage_errors
        |FROM events""".stripMargin,
    "k4_upsert_merge" ->
      """WITH u AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    round(c_acctbal + 100, 2) AS c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'New#' || c_name, c_nationkey,
        |    c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 97 = 0)
        |SELECT coalesce(u.c_custkey, t.c_custkey) AS c_custkey,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name
        |    ELSE t.c_name END AS c_name,
        |  round(CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal
        |    ELSE t.c_acctbal END, 2) AS c_acctbal,
        |  t.c_custkey IS NULL AS __is_insert,
        |  t.c_custkey IS NOT NULL AND u.c_custkey IS NOT NULL
        |    AS __is_update
        |FROM customer t FULL OUTER JOIN u ON t.c_custkey = u.c_custkey
        |ORDER BY c_custkey""".stripMargin,
    "k5_points_long" ->
      """SELECT o_orderdate AS time, 'orders' AS measurement,
        |  o_orderstatus AS tag_o_orderstatus, 'o_totalprice' AS field,
        |  o_totalprice AS value
        |FROM orders WHERE o_orderkey < 200
        |ORDER BY time, value, tag_o_orderstatus""".stripMargin,
    "k8_routing_counts" ->
      """WITH tagged AS (SELECT CASE
        |    WHEN event_type = 'purchase' THEN 'transactions'
        |    WHEN event_type = 'click' THEN 'user_profiles'
        |    WHEN event_type = 'error' THEN 'logs'
        |    WHEN event_type = 'signup' THEN 'users'
        |    ELSE 'events' END AS _source
        |  FROM events)
        |SELECT
        |  CAST(sum(CASE WHEN regexp_matches(_source, 'transaction|order')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS financial_data,
        |  CAST(sum(CASE WHEN regexp_matches(_source, 'event|log')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS processed_events,
        |  CAST(sum(CASE WHEN regexp_matches(_source, 'user|profile')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS user_data_wh,
        |  CAST(sum(CASE WHEN regexp_matches(_source, 'user|profile')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS user_data_doc,
        |  count(*) AS archive
        |FROM tagged""".stripMargin,
    "k9_delete_range" ->
      """SELECT
        |  CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-10 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-20 00:00:00' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_deleted,
        |  CAST(sum(CASE WHEN NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-20 00:00:00') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept
        |FROM events""".stripMargin,
    "k_versioned_tt" ->
      """WITH base AS (SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_custkey < 100)
        |SELECT CAST(0 AS BIGINT) AS version, count(*) AS n_rows,
        |  round(sum(c_acctbal), 2) AS bal_sum FROM base
        |UNION ALL
        |SELECT 1, count(*),
        |  round(sum(CASE WHEN c_custkey % 10 = 0
        |    THEN round(c_acctbal + 100, 2) ELSE c_acctbal END), 2)
        |FROM base
        |UNION ALL
        |SELECT 2, count(*), round(sum(c_acctbal), 2)
        |FROM base WHERE c_custkey < 50
        |ORDER BY version""".stripMargin,
    "k_versioned_diff" ->
      """WITH base AS (SELECT c_custkey FROM customer WHERE c_custkey < 100)
        |SELECT c_custkey, 'removed' AS change FROM base WHERE c_custkey < 10
        |UNION ALL
        |SELECT c_custkey, 'changed' FROM base
        |WHERE c_custkey >= 10 AND c_custkey % 10 = 0
        |UNION ALL
        |SELECT c_custkey + 1000, 'added' FROM base WHERE c_custkey % 7 = 0
        |ORDER BY c_custkey""".stripMargin,
    "k9b_delete_keys" ->
      """SELECT
        |  CAST(sum(CASE WHEN user_id % 13 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_deleted,
        |  CAST(sum(CASE WHEN user_id % 13 <> 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  CAST(count(DISTINCT CASE WHEN user_id % 13 <> 0
        |    THEN user_id END) AS BIGINT) AS n_users_kept
        |FROM events""".stripMargin,
    "k_ledger" ->
      """SELECT CAST(user_id % 3 AS BIGINT) AS batch, count(*) AS n
        |FROM events WHERE user_id % 3 <= 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "k1_append_replace" ->
      """WITH p AS (SELECT p_size,
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS cents
        |  FROM part),
        |ph AS (
        |  SELECT '1_replace' AS phase, count(*) AS n_rows,
        |    count(*) AS n_loaded, sum(cents) AS price_cents
        |  FROM p WHERE p_size <= 10
        |  UNION ALL
        |  SELECT '2_append', count(*) FILTER (WHERE TRUE),
        |    count(*) FILTER (WHERE p_size > 10), sum(cents)
        |  FROM p WHERE p_size <= 20
        |  UNION ALL
        |  SELECT '3_replace', count(*), count(*), sum(cents)
        |  FROM p WHERE p_size BETWEEN 5 AND 8)
        |SELECT phase, n_rows, n_loaded,
        |  CAST(price_cents AS BIGINT) AS price_cents FROM ph
        |ORDER BY phase""".stripMargin,
    "k6_file_roundtrip" ->
      """WITH a AS (SELECT count(*) AS n_rows,
        |    CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments,
        |    CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |      AS bal_cents
        |  FROM customer)
        |SELECT fmt AS format, n_rows, n_segments, bal_cents
        |FROM a, (SELECT unnest(['csv', 'json', 'parquet']) AS fmt) f
        |ORDER BY format""".stripMargin,
    "k_compaction" ->
      """SELECT CAST(64 AS BIGINT) AS files_before,
        |  CAST(1 AS BIGINT) AS files_after,
        |  TRUE AS content_equal,
        |  count(*) AS n_rows
        |FROM events""".stripMargin,
    "k_stats_prune" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(16 AS BIGINT) AS files_total,
        |  TRUE AS pruned
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
        |  AND l_shipdate <= TIMESTAMP '1997-04-30 23:59:59'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "k_dyn_overwrite" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
        |  round(sum(CASE WHEN strftime(ts, '%Y-%m-%d')
        |    IN ('2024-01-05', '2024-01-10')
        |    THEN value * 2 ELSE value END), 2) AS total
        |FROM events
        |GROUP BY day ORDER BY day""".stripMargin
  )
}
