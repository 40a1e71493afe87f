package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.transform.{FieldRule, Stamp, Validation}
import graft.validate._

/** Validation operators (SURVEY.md §2.9 V1–V5, §2.3 P5, §2.5 A5/A7) as
  * judged queries: per-record flagging and the one-pass dataset-level
  * violation/quality aggregates.
  */
object ValidationQueries extends QuerySection {
  import Catalog.Q

  /** V1 per-record validation flags over a synthesized dirty frame:
    * email validity + numeric range, `_validation_errors` array semantics
    * projected to (n_errors, first_error) for the oracle. */
  private def v1Flags(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        when(col("event_id") % 3 === 0,
          concat(lit("u"), col("user_id"), lit("@example.com")))
          .otherwise(lit("bad-email")).as("email"))
    val rules = Map(
      "email" -> FieldRule(required = true, typ = Some("email")),
      "value" -> FieldRule(min = Some(0), max = Some(50)))
    Validation(rules, Stamp.off)(base)
      .select(col("event_id"), col("email"), col("_is_valid"),
        size(col("_validation_errors")).as("n_errors"),
        try_element_at(col("_validation_errors"), lit(1)).as("first_error"))
      .orderBy(col("event_id")).limit(1000)
  }

  /** V2 schema validation as a one-row violation-count aggregate. */
  private def v2SchemaCounts(s: SparkSession, dir: String): DataFrame =
    SchemaValidator(Map(
      "o_totalprice" -> FieldRule(required = true,
        min = Some(0), max = Some(300000)),
      "o_orderstatus" -> FieldRule(required = true,
        minLength = Some(1), maxLength = Some(1))))
      .violationCountsDF(Tables.load(s, dir, "orders"))

  /** V3 data-quality metrics as a one-row aggregate (A2/A3/A4/A5 in a
    * single pass + one distinct count). */
  private def v3QualityMetrics(s: SparkSession, dir: String): DataFrame =
    QualityValidator().metricsDF(
      Tables.load(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderpriority"),
          col("o_totalprice")))

  /** V4 business rules: range + relationship violation counts (A7). */
  private def v4BusinessRules(s: SparkSession, dir: String): DataFrame =
    BusinessRuleValidator(Seq(
      RangeRule("price_range", "o_totalprice",
        min = Some(1000), max = Some(400000)),
      RelationshipRule("price_gt_custkey", "o_totalprice", "o_custkey",
        "greater_than")))
      .violationCountsDF(Tables.load(s, dir, "orders"))

  /** P5 validity filter: keep records passing validation, then aggregate
    * — the DAG's filter-then-load shape. */
  private def p5ValidityFilter(s: SparkSession, dir: String): DataFrame = {
    val rules = Map("value" -> FieldRule(min = Some(5), max = Some(80)))
    val flagged = Validation(rules, Stamp.off)(Tables.load(s, dir, "events"))
    flagged.filter(size(col("_validation_errors")) === 0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy(col("event_type"))
  }

  /** V+ — ingest-volume anomaly detection: flag (day, event_type)
    * cells whose daily count sits ≥ 1.5σ from that type's mean — the
    * ops check a production lake runs on every pipeline (a collapsed
    * or doubled feed shows up here before any value-level rule fires).
    * Composes the daily rollup with per-group z-scores
    * (`Features.zscore`); one aggregate + one keyed window. */
  private def v5AnomalyDays(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    graft.curation.Features.zscore(daily, "event_type", "n")
      // filter on the ROUNDED value exactly as exported, so the
      // boundary decision can't differ from the oracle's
      .withColumn("z", round(col("z"), 6))
      .filter(abs(col("z")) >= 1.5)
      .select(col("day"), col("event_type"), col("n"), col("z"))
      .orderBy(col("day"), col("event_type"))
  }

  /** V+ — distribution drift (PSI) between the first and second half
    * of the ingest window, per event_type: the scorecard that catches
    * a feed whose values shifted while every range rule still passes.
    * 10 fixed-width bins over [0, 500); ε-floored fractions replayed
    * exactly in the oracle. */
  private def v6DriftPsi(s: SparkSession, dir: String): DataFrame =
    graft.validate.Drift.psi(Tables.load(s, dir, "events"),
        "event_type", "value",
        refCond = col("ts") < lit("2024-01-16"),
        binWidth = 50.0, nBins = 10)
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        round(col("psi"), 6).as("psi"))
      .orderBy(col("event_type"))

  /** V+ — drift between LAKE VERSIONS, end to end: commit the
    * first-half feed as `v=0`, the full feed as `v=1`, read both
    * versions back, isolate v1's new rows by anti-join on the key, and
    * run the PSI scorecard with v0 as the reference. Composes
    * `Sinks.Versioned` (write → `_SUCCESS`-gated read) with
    * `Drift.psi`; the oracle computes the same drift straight from the
    * source table, so equal hashes prove the whole
    * version-write/read/diff path preserves the distributions it
    * feeds into monitoring. */
  private def v7DriftVersions(s: SparkSession, dir: String): DataFrame = {
    import graft.sinks.Sinks
    val path = graft.etl.Utils.tempDir("graft_vdrift").toString + "/t"
    val ev = Tables.load(s, dir, "events")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    Sinks.Versioned.write(ev.filter(col("ts") < lit("2024-01-16")), path)
    Sinks.Versioned.write(ev, path)
    val v0 = Sinks.Versioned.read(s, path, Some(0L))
    val v1New = Sinks.Versioned.read(s, path, Some(1L))
      .join(v0.select(col("event_id")), Seq("event_id"), "left_anti")
    val combined = v0.withColumn("__ref", lit(true))
      .unionByName(v1New.withColumn("__ref", lit(false)))
    graft.validate.Drift.psi(combined, "event_type", "value",
        refCond = col("__ref"), binWidth = 50.0, nBins = 10)
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        round(col("psi"), 6).as("psi"))
      .orderBy(col("event_type"))
  }

  /** V+ — k-anonymity re-identification audit
    * (`validate.Privacy.kAnonymityRisk`): equivalence classes of the
    * quasi-identifier tuple (nation, market segment) smaller than
    * k = 8 — the extract-release governance check; the risky classes
    * are the minority the release process must suppress or generalize.
    * One hash aggregate; output is equivalence-class-bounded. */
  private def v8Kanon(s: SparkSession, dir: String): DataFrame =
    graft.validate.Privacy.kAnonymityRisk(
        Tables.load(s, dir, "customer"),
        Seq(col("c_nationkey"), col("c_mktsegment")),
        k = 8L)
      .orderBy(col("c_nationkey"), col("c_mktsegment"))

  /** V+ — chi-squared independence (`validate.Dependence.chiSquare`):
    * is event type independent of the value band? The stratification /
    * drift-triage diagnostic; NULL values form a real 'na' band. One
    * cell aggregate; everything after is contingency-table-bounded. */
  private def v9Chi2(s: SparkSession, dir: String): DataFrame =
    graft.validate.Dependence.chiSquare(
      Tables.load(s, dir, "events").withColumn("band",
        when(col("value").isNull, "na")
          .when(col("value") < 100, "lo")
          .when(col("value") < 300, "mid")
          .otherwise("hi")),
      "event_type", "band")

  /** V+ — column profiling (`validate.Profile.columnProfile`): null
    * share, cardinality, and Shannon entropy per column — the catalog
    * scorecard. One unpivot + one (column, value) aggregate; rollups
    * are cardinality-bounded. */
  private def v10Profile(s: SparkSession, dir: String): DataFrame =
    graft.validate.Profile.columnProfile(
        Tables.load(s, dir, "customer"),
        Seq("c_name", "c_mktsegment", "c_nationkey"))
      .orderBy(col("col_name"))

  /** V+ — A/B readout (`validate.Experiment.welchPairs`): Welch's
    * unequal-variance t-test over every pair of event-type arms on
    * the value metric. One partial+final aggregate reduces each arm
    * to (n, mean, var); the arms² pair expansion never re-touches
    * row data. */
  private def v11AbWelch(s: SparkSession, dir: String): DataFrame =
    graft.validate.Experiment.welchPairs(
        Tables.load(s, dir, "events"), "event_type", "value")
      .orderBy(col("arm_a"), col("arm_b"))

  /** V+ — pairwise correlation matrix
    * (`validate.NumericProfile.corrMatrix`): all 6 pairs of the four
    * lineitem measures in ONE aggregate pass; the unpivot runs on the
    * 1-row summary. */
  private def v12CorrMatrix(s: SparkSession, dir: String): DataFrame =
    graft.validate.NumericProfile.corrMatrix(
        Tables.load(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy(col("col_a"), col("col_b"))

  /** V+ — Benford first-digit audit
    * (`validate.NumericProfile.benford`) on order totals: natural
    * spending amounts should track log10(1+1/d); a flat or spiked
    * digit histogram flags synthetic or tampered data. */
  private def v13Benford(s: SparkSession, dir: String): DataFrame =
    graft.validate.NumericProfile.benford(
        Tables.load(s, dir, "orders"), "o_totalprice")
      .orderBy(col("digit"))

  /** V+ — functional-dependency audit (`validate.Dependence.fdAudit`):
    * three schema claims over orders — the natural key determines its
    * customer and status (must hold), while customer → priority is a
    * deliberately false claim the audit must quantify, not just flag.
    * Per claim: one (lhs, rhs) pair aggregate + per-key rollup; the
    * judged row carries key/violator counts and the verdict. */
  private def v14FdAudit(s: SparkSession, dir: String): DataFrame =
    graft.validate.Dependence.fdAudit(
        Tables.load(s, dir, "orders"),
        Seq("o_orderkey" -> "o_custkey",
          "o_orderkey" -> "o_orderstatus",
          "o_custkey" -> "o_orderpriority"))
      .orderBy(col("fd"))

  /** V+ — referential-integrity audit (`validate.Dependence.fkAudit`):
    * the star schema's three FK spokes — lineitem→orders,
    * orders→customer, events→customer — checked for orphans in one
    * pass each (child FK left-joined to the parent's distinct keys).
    * The multi-source consistency check the reference's separate
    * stores (SQL/Mongo/Influx) could never run in one engine. */
  private def v15RefIntegrity(s: SparkSession, dir: String): DataFrame =
    graft.validate.Dependence.fkAudit(Seq(
        ("lineitem.l_orderkey->orders", Tables.load(s, dir, "lineitem"),
          "l_orderkey", Tables.load(s, dir, "orders"), "o_orderkey"),
        ("orders.o_custkey->customer", Tables.load(s, dir, "orders"),
          "o_custkey", Tables.load(s, dir, "customer"), "c_custkey"),
        ("events.user_id->customer", Tables.load(s, dir, "events"),
          "user_id", Tables.load(s, dir, "customer"), "c_custkey")))
      .orderBy(col("relation"))

  /** V5 judged (`data_validators.py:270-308`): ValidationPipeline runs
    * every validator with PER-VALIDATOR failure isolation and rolls up
    * a summary. The fixture plants one deliberately-throwing validator
    * ("Freshness Validator" — the reference's `except Exception` path,
    * which must become an invalid report carrying the error, not a
    * pipeline abort) beside three real validators over orders; the
    * judged rows are each validator's (is_valid, error/warning counts,
    * first error string) plus the `get_summary` rollup row. All counts
    * replayed by the oracle from the table — nothing hardcoded. */
  private def v5PipelineSummary(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val failing = new Validator {
      val name = "Freshness Validator"
      def validate(d: DataFrame): ValidationReport =
        throw new IllegalStateException("clock source unavailable")
    }
    val pipe = ValidationPipeline(Seq(
      SchemaValidator(Map("o_totalprice" ->
        FieldRule(required = true, min = Some(0), max = Some(300000)))),
      QualityValidator(),
      BusinessRuleValidator(Seq(RangeRule("price_range", "o_totalprice",
        min = Some(1000), max = Some(400000)))),
      failing))
    val results = pipe.validate(base)
    val rows = results.toSeq.sortBy(_._1).map { case (n, r) =>
      (n, r.isValid, r.errors.size, r.warnings.size,
        r.errors.headOption.orNull)
    } :+ (("~overall", pipe.isValid(results),
      results.values.map(_.errors.size).sum,
      results.values.map(_.warnings.size).sum, null: String))
    import s.implicits._
    rows.toDF("validator", "is_valid", "n_errors", "n_warnings",
      "first_error").orderBy(col("validator"))
  }

  def queries: Map[String, Q] = Map(
    "v5_pipeline_summary" -> (v5PipelineSummary _),
    "v15_ref_integrity" -> (v15RefIntegrity _),
    "v14_fd_audit" -> (v14FdAudit _),
    "v12_corr_matrix" -> (v12CorrMatrix _),
    "v13_benford" -> (v13Benford _),
    "v11_ab_welch" -> (v11AbWelch _),
    "v10_profile" -> (v10Profile _),
    "v9_chi2" -> (v9Chi2 _),
    "v8_kanon" -> (v8Kanon _),
    "v7_drift_versions" -> (v7DriftVersions _),
    "v6_drift_psi" -> (v6DriftPsi _),
    "v1_flags" -> (v1Flags _),
    "v2_schema_counts" -> (v2SchemaCounts _),
    "v3_quality_metrics" -> (v3QualityMetrics _),
    "v4_business_rules" -> (v4BusinessRules _),
    "v5_anomaly_days" -> (v5AnomalyDays _),
    "p5_validity_filter" -> (p5ValidityFilter _)
  )

  def oracleSql: Map[String, String] = Map(
    "v5_pipeline_summary" ->
      """WITH sch AS (SELECT
        |    CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_missing,
        |    CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_below,
        |    CAST(sum(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_above
        |  FROM orders),
        |qual AS (SELECT
        |    (CASE WHEN avg(CASE WHEN o_orderkey IS NULL THEN 1.0
        |       ELSE 0.0 END) > 0.1 THEN 1 ELSE 0 END)
        |    + (CASE WHEN avg(CASE WHEN o_orderstatus IS NULL THEN 1.0
        |       ELSE 0.0 END) > 0.1 THEN 1 ELSE 0 END)
        |    + (CASE WHEN avg(CASE WHEN o_totalprice IS NULL THEN 1.0
        |       ELSE 0.0 END) > 0.1 THEN 1 ELSE 0 END)
        |    + (CASE WHEN CAST(count(*) - (SELECT count(*) FROM
        |       (SELECT DISTINCT o_orderkey, o_orderstatus, o_totalprice
        |        FROM orders)) AS DOUBLE) / count(*) > 0.05
        |       THEN 1 ELSE 0 END)
        |    + (CASE WHEN stddev_samp(o_orderkey) = 0 THEN 1 ELSE 0 END)
        |    + (CASE WHEN stddev_samp(o_totalprice) = 0 THEN 1 ELSE 0 END)
        |      AS n_warn
        |  FROM orders),
        |biz AS (SELECT CAST(sum(CASE WHEN o_totalprice IS NOT NULL AND
        |    (o_totalprice < 1000 OR o_totalprice > 400000)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_viol
        |  FROM orders),
        |rows_ AS (
        |  SELECT 'Business Rule Validator' AS validator,
        |    n_viol = 0 AS is_valid,
        |    CAST(CASE WHEN n_viol > 0 THEN 1 ELSE 0 END AS INT)
        |      AS n_errors,
        |    CAST(0 AS INT) AS n_warnings,
        |    CASE WHEN n_viol > 0 THEN 'Rule ''price_range'': ' || n_viol
        |      || ' violations found' END AS first_error
        |  FROM biz
        |  UNION ALL
        |  SELECT 'Data Quality Validator', TRUE, CAST(0 AS INT),
        |    CAST(n_warn AS INT), NULL
        |  FROM qual
        |  UNION ALL
        |  SELECT 'Freshness Validator', FALSE, CAST(1 AS INT),
        |    CAST(0 AS INT),
        |    'Validator ''Freshness Validator'' failed: ' ||
        |      'clock source unavailable'
        |  UNION ALL
        |  SELECT 'Schema Validator',
        |    n_missing + n_below + n_above = 0,
        |    CAST((CASE WHEN n_missing > 0 THEN 1 ELSE 0 END)
        |      + (CASE WHEN n_below > 0 THEN 1 ELSE 0 END)
        |      + (CASE WHEN n_above > 0 THEN 1 ELSE 0 END) AS INT),
        |    CAST(0 AS INT),
        |    CASE WHEN n_missing > 0 THEN 'o_totalprice missing or empty: '
        |        || n_missing || ' records'
        |      WHEN n_below > 0 THEN 'o_totalprice below minimum 0: '
        |        || n_below || ' records'
        |      WHEN n_above > 0 THEN 'o_totalprice above maximum 300000: '
        |        || n_above || ' records' END
        |  FROM sch)
        |SELECT * FROM rows_
        |UNION ALL
        |SELECT '~overall', FALSE,
        |  CAST(sum(n_errors) AS INT), CAST(sum(n_warnings) AS INT), NULL
        |FROM rows_
        |ORDER BY validator""".stripMargin,
    "v15_ref_integrity" ->
      """WITH checks AS (
        |  SELECT 'lineitem.l_orderkey->orders' AS relation,
        |    count(*) AS n_rows,
        |    CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_orphans
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_orderkey IS NOT NULL
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer', count(*),
        |    CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT)
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE o.o_custkey IS NOT NULL
        |  UNION ALL
        |  SELECT 'events.user_id->customer', count(*),
        |    CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT)
        |  FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |  WHERE e.user_id IS NOT NULL)
        |SELECT relation, n_rows, n_orphans, n_orphans = 0 AS ok
        |FROM checks ORDER BY relation""".stripMargin,
    "v14_fd_audit" ->
      """WITH audit AS (
        |  SELECT 'o_orderkey->o_custkey' AS fd, o_orderkey AS lhs,
        |    coalesce(CAST(o_custkey AS VARCHAR), '<NULL>') AS rhs
        |  FROM orders WHERE o_orderkey IS NOT NULL
        |  UNION ALL
        |  SELECT 'o_orderkey->o_orderstatus', o_orderkey,
        |    coalesce(o_orderstatus, '<NULL>')
        |  FROM orders WHERE o_orderkey IS NOT NULL
        |  UNION ALL
        |  SELECT 'o_custkey->o_orderpriority', o_custkey,
        |    coalesce(o_orderpriority, '<NULL>')
        |  FROM orders WHERE o_custkey IS NOT NULL),
        |per_key AS (
        |  SELECT fd, lhs, count(DISTINCT rhs) AS variants
        |  FROM audit GROUP BY fd, lhs)
        |SELECT fd, count(*) AS n_keys,
        |  CAST(sum(CASE WHEN variants > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating,
        |  max(variants) AS max_variants,
        |  sum(CASE WHEN variants > 1 THEN 1 ELSE 0 END) = 0 AS holds
        |FROM per_key GROUP BY fd ORDER BY fd""".stripMargin,
    "v12_corr_matrix" ->
      """WITH c AS (
        |  SELECT
        |    corr(l_quantity, l_extendedprice) AS c_qe,
        |    corr(l_quantity, l_discount) AS c_qd,
        |    corr(l_quantity, l_tax) AS c_qt,
        |    corr(l_extendedprice, l_discount) AS c_ed,
        |    corr(l_extendedprice, l_tax) AS c_et,
        |    corr(l_discount, l_tax) AS c_dt
        |  FROM lineitem)
        |SELECT col_a, col_b, round(v, 6) AS corr FROM (
        |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
        |    c_qe AS v FROM c
        |  UNION ALL SELECT 'l_quantity', 'l_discount', c_qd FROM c
        |  UNION ALL SELECT 'l_quantity', 'l_tax', c_qt FROM c
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount', c_ed FROM c
        |  UNION ALL SELECT 'l_extendedprice', 'l_tax', c_et FROM c
        |  UNION ALL SELECT 'l_discount', 'l_tax', c_dt FROM c)
        |ORDER BY col_a, col_b""".stripMargin,
    "v13_benford" ->
      """WITH d AS (
        |  SELECT CAST(regexp_extract(CAST(CAST(round(
        |      CAST(o_totalprice AS DOUBLE), 2) AS DECIMAL(18,2))
        |      AS VARCHAR), '([1-9])', 1) AS INT) AS digit
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL
        |    AND regexp_extract(CAST(CAST(round(
        |      CAST(o_totalprice AS DOUBLE), 2) AS DECIMAL(18,2))
        |      AS VARCHAR), '([1-9])', 1) <> ''),
        |g AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM g)
        |SELECT digit, n, round(n / (SELECT tot FROM t), 6) AS share,
        |  round(log10(1.0 + 1.0 / digit), 6) AS expected
        |FROM g ORDER BY digit""".stripMargin,
    "v11_ab_welch" ->
      """WITH arms AS (
        |  SELECT event_type AS arm, count(value) AS n,
        |    avg(value) AS mean, var_samp(value) AS v
        |  FROM events WHERE value IS NOT NULL
        |  GROUP BY 1 HAVING count(value) >= 2)
        |SELECT a.arm AS arm_a, b.arm AS arm_b, a.n AS na, b.n AS nb,
        |  round(a.mean, 6) AS mean_a, round(b.mean, 6) AS mean_b,
        |  round(a.mean - b.mean, 6) AS diff,
        |  round((a.mean - b.mean) / sqrt(a.v / a.n + b.v / b.n), 6) AS t,
        |  round(pow(a.v / a.n + b.v / b.n, 2)
        |    / (pow(a.v / a.n, 2) / (a.n - 1)
        |      + pow(b.v / b.n, 2) / (b.n - 1)), 6) AS dof
        |FROM arms a JOIN arms b ON a.arm < b.arm
        |ORDER BY arm_a, arm_b""".stripMargin,
    "v10_profile" ->
      """WITH p AS (
        |  SELECT 'c_name' AS col_name, CAST(c_name AS VARCHAR) AS val
        |  FROM customer
        |  UNION ALL
        |  SELECT 'c_mktsegment', CAST(c_mktsegment AS VARCHAR)
        |  FROM customer
        |  UNION ALL
        |  SELECT 'c_nationkey', CAST(c_nationkey AS VARCHAR)
        |  FROM customer),
        |f AS (SELECT col_name, val, count(*) AS c FROM p GROUP BY 1, 2),
        |t AS (SELECT col_name, CAST(sum(c) AS DOUBLE) AS nn
        |  FROM f WHERE val IS NOT NULL GROUP BY 1)
        |SELECT f.col_name, CAST(sum(c) AS BIGINT) AS n,
        |  CAST(coalesce(sum(CASE WHEN val IS NULL THEN c END), 0)
        |    AS BIGINT) AS n_null,
        |  count(CASE WHEN val IS NOT NULL THEN 1 END) AS n_distinct,
        |  round(coalesce(-sum(CASE WHEN val IS NOT NULL
        |    THEN c / nn * ln(c / nn) END), 0.0), 6) AS entropy
        |FROM f LEFT JOIN t USING (col_name)
        |GROUP BY 1 ORDER BY col_name""".stripMargin,
    "v9_chi2" ->
      """WITH b AS (
        |  SELECT event_type AS a,
        |    CASE WHEN value IS NULL THEN 'na'
        |      WHEN value < 100 THEN 'lo'
        |      WHEN value < 300 THEN 'mid'
        |      ELSE 'hi' END AS bnd
        |  FROM events),
        |cells AS (SELECT a, bnd, count(*) AS o FROM b GROUP BY 1, 2),
        |at AS (SELECT a, sum(o) AS na FROM cells GROUP BY a),
        |bt AS (SELECT bnd, sum(o) AS nb FROM cells GROUP BY bnd),
        |tot AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM cells),
        |ks AS (SELECT (SELECT count(*) FROM at) AS ka,
        |  (SELECT count(*) FROM bt) AS kb)
        |SELECT CAST(tot.n AS BIGINT) AS n,
        |  (ks.ka - 1) * (ks.kb - 1) AS dof,
        |  round(sum((o - na * nb / tot.n) * (o - na * nb / tot.n)
        |    / (na * nb / tot.n)), 6) AS chi2
        |FROM cells
        |JOIN at USING (a) JOIN bt USING (bnd)
        |CROSS JOIN tot CROSS JOIN ks
        |GROUP BY 1, 2""".stripMargin,
    "v8_kanon" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS n
        |FROM customer
        |GROUP BY 1, 2
        |HAVING count(*) < 8
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    // identical drift computed straight from the source halves — equal
    // hashes prove the versioned write/read/anti-join-diff round-trip
    "v7_drift_versions" ->
      """WITH binned AS (
        |  SELECT event_type,
        |    CAST(least(floor(value / 50), 9) AS BIGINT) AS bin,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
        |      AS is_ref
        |  FROM events),
        |cells AS (
        |  SELECT event_type, bin,
        |    CAST(sum(is_ref) AS BIGINT) AS ref_n,
        |    CAST(sum(1 - is_ref) AS BIGINT) AS cur_n
        |  FROM binned GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, sum(ref_n) AS ref_tot, sum(cur_n) AS cur_tot
        |  FROM cells GROUP BY 1)
        |SELECT event_type,
        |  CAST(sum(ref_n) AS BIGINT) AS n_ref,
        |  CAST(sum(cur_n) AS BIGINT) AS n_cur,
        |  round(sum(
        |    (greatest(cur_n / cur_tot, 1e-6) -
        |     greatest(ref_n / ref_tot, 1e-6)) *
        |    ln(greatest(cur_n / cur_tot, 1e-6) /
        |       greatest(ref_n / ref_tot, 1e-6))), 6) AS psi
        |FROM cells JOIN tot USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "v6_drift_psi" ->
      """WITH binned AS (
        |  SELECT event_type,
        |    CAST(least(floor(value / 50), 9) AS BIGINT) AS bin,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
        |      AS is_ref
        |  FROM events),
        |cells AS (
        |  SELECT event_type, bin,
        |    CAST(sum(is_ref) AS BIGINT) AS ref_n,
        |    CAST(sum(1 - is_ref) AS BIGINT) AS cur_n
        |  FROM binned GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, sum(ref_n) AS ref_tot, sum(cur_n) AS cur_tot
        |  FROM cells GROUP BY 1)
        |SELECT event_type,
        |  CAST(sum(ref_n) AS BIGINT) AS n_ref,
        |  CAST(sum(cur_n) AS BIGINT) AS n_cur,
        |  round(sum(
        |    (greatest(cur_n / cur_tot, 1e-6) -
        |     greatest(ref_n / ref_tot, 1e-6)) *
        |    ln(greatest(cur_n / cur_tot, 1e-6) /
        |       greatest(ref_n / ref_tot, 1e-6))), 6) AS psi
        |FROM cells JOIN tot USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "v5_anomaly_days" ->
      """WITH daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT day, event_type, n, z FROM (
        |  SELECT day, event_type, n,
        |    CASE WHEN stddev_pop(n) OVER w = 0 THEN NULL
        |      ELSE round((n - avg(n) OVER w) / (stddev_pop(n) OVER w), 6)
        |      END AS z
        |  FROM daily WINDOW w AS (PARTITION BY event_type))
        |WHERE abs(z) >= 1.5
        |ORDER BY day, event_type""".stripMargin,
    "v1_flags" ->
      """WITH b AS (SELECT event_id, user_id, value,
        |    CASE WHEN event_id % 3 = 0
        |      THEN 'u' || user_id || '@example.com'
        |      ELSE 'bad-email' END AS email
        |  FROM events),
        |e AS (SELECT event_id, email, value,
        |    CASE WHEN NOT regexp_matches(email,
        |      '^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$')
        |      THEN 1 ELSE 0 END AS email_err,
        |    CASE WHEN value < 0 THEN 1 ELSE 0 END AS min_err,
        |    CASE WHEN value > 50 THEN 1 ELSE 0 END AS max_err
        |  FROM b)
        |SELECT event_id, email,
        |  (email_err + min_err + max_err) = 0 AS _is_valid,
        |  CAST(email_err + min_err + max_err AS INT) AS n_errors,
        |  CASE WHEN email_err = 1 THEN 'email is not a valid email'
        |    WHEN min_err = 1 THEN 'value is below minimum value 0'
        |    WHEN max_err = 1 THEN 'value exceeds maximum value 50'
        |    END AS first_error
        |FROM e ORDER BY event_id LIMIT 1000""".stripMargin,
    "v2_schema_counts" ->
      """SELECT count(*) AS total_records,
        |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS viol_o_totalprice_missing_or_empty,
        |  CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS viol_o_totalprice_below_minimum_0,
        |  CAST(sum(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS viol_o_totalprice_above_maximum_300000,
        |  CAST(sum(CASE WHEN o_orderstatus IS NULL OR o_orderstatus = ''
        |    THEN 1 ELSE 0 END) AS BIGINT) AS viol_o_orderstatus_missing_or_empty,
        |  CAST(sum(CASE WHEN length(o_orderstatus) < 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS viol_o_orderstatus_length_below_minimum_1,
        |  CAST(sum(CASE WHEN length(o_orderstatus) > 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS viol_o_orderstatus_length_above_maximum_1
        |FROM orders""".stripMargin,
    "v3_quality_metrics" ->
      """SELECT count(*) AS total_records,
        |  (SELECT count(*) FROM (SELECT DISTINCT o_orderstatus,
        |    o_orderpriority, o_totalprice FROM orders)) AS distinct_records,
        |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS nulls_o_orderstatus,
        |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS nulls_o_orderpriority,
        |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS nulls_o_totalprice,
        |  stddev_samp(o_totalprice) = 0.0 AS novar_o_totalprice,
        |  count(*) - (SELECT count(*) FROM (SELECT DISTINCT o_orderstatus,
        |    o_orderpriority, o_totalprice FROM orders)) AS duplicate_count
        |FROM orders""".stripMargin,
    "v4_business_rules" ->
      """SELECT count(*) AS total_records,
        |  CAST(sum(CASE WHEN o_totalprice IS NOT NULL AND
        |    (o_totalprice < 1000 OR o_totalprice > 400000)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS viol_price_range,
        |  CAST(sum(CASE WHEN NOT (o_totalprice > o_custkey) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS viol_price_gt_custkey
        |FROM orders""".stripMargin,
    "p5_validity_filter" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events WHERE value >= 5 AND value <= 80
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
