package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.scalars._
import graft.transform._

/** Scalar-function and transformer operators (SURVEY.md §2.8 F1–F24,
  * §2.10 O1) as judged queries. The testdata has no dirty
  * phone/email/address columns, so the queries synthesize them
  * deterministically from key columns and then run the real cleaning /
  * enrichment machinery over them — the oracle replays the same
  * synthesis + semantics in ANSI SQL.
  */
object TransformQueries extends QuerySection {
  import Catalog.Q

  /** F2/F3/F4/F18 string-function bundle. */
  private def fxStrings(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")
      .select(col("c_custkey"),
        lower(col("c_name")).as("lo"),
        upper(col("c_mktsegment")).as("up"),
        length(col("c_name")).as("len"),
        substring(col("c_name"), 10, 4).as("sub"),
        titleCase(lower(col("c_mktsegment"))).as("title"),
        sanitize(concat(lit("\t "), col("c_name"), lit(" "))).as("sane"))
      .orderBy(col("c_custkey")).limit(500)

  /** F5/F10 phone normalization over synthesized digit strings. */
  private def fxPhone(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "customer")
      .select(col("c_custkey"),
        (lit(5550000000L) + col("c_custkey")).cast("string").as("p10"))
      .withColumn("p11", concat(lit("1"), col("p10")))
      .withColumn("bad", substring(col("p10"), 1, 5))
    base.select(col("c_custkey"),
      normalizePhone(col("p10")).as("norm10"),
      normalizePhone(col("p11")).as("norm11"),
      normalizePhone(col("bad")).as("norm_bad"),
      isPhone(col("p10")).as("is_phone10"),
      isPhone(col("bad")).as("is_phone_bad"))
      .orderBy(col("c_custkey")).limit(500)
  }

  /** F8/F12/F21 date functions: extract/trunc/diff/age/format. */
  private def fxDates(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("q"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("2002-01-01").cast("date"),
          col("o_orderdate").cast("date")).as("days_to_2002"),
        age(col("o_orderdate"), to_date(lit("2026-01-01"))).as("years_age"),
        date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("iso"))
      .orderBy(col("o_orderkey")).limit(500)

  /** F7/F9/F10/F11 detectors + type detection over synthesized strings. */
  private def fxDetect(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "customer")
      .select(col("c_custkey"),
        concat(regexp_replace(lower(col("c_name")), "[^a-z0-9]", ""),
          lit("@example.com")).as("email_ok"),
        col("c_mktsegment").as("email_bad"),
        concat(lit("https://example.com/c/"), col("c_custkey")).as("url_ok"),
        date_format(lit("2023-01-15").cast("date"), "yyyy-MM-dd").as("date_s"))
    base.select(col("c_custkey"),
      isEmail(col("email_ok")).as("email_valid"),
      isEmail(col("email_bad")).as("bad_valid"),
      isUrl(col("url_ok")).as("url_valid"),
      isDate(col("date_s")).as("date_valid"),
      detectStringType(col("email_ok")).as("t_email"),
      detectStringType(col("url_ok")).as("t_url"),
      detectStringType(col("date_s")).as("t_date"),
      detectStringType(col("email_bad")).as("t_plain"))
      .orderBy(col("c_custkey")).limit(500)
  }

  /** Accent normalization (native `Unaccent` Catalyst expression —
    * NFD + strip combining marks, full codegen): deterministic accents
    * are planted via translate, the expression must fold them back. */
  private def fxUnaccent(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "customer")
      .select(col("c_custkey"),
        translate(lower(col("c_name")), "aeioun", "áéíóüñ").as("accented"))
    base.select(col("c_custkey"), col("accented"),
      org.apache.spark.sql.graftx.Unaccent(col("accented")).as("plain"))
      .orderBy(col("c_custkey")).limit(500)
  }

  /** F14 record hash (md5 over stringified key fields). */
  private def fxHash(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")
      .select(col("c_custkey"),
        recordHash(Seq(col("c_custkey"), col("c_name"), col("c_mktsegment")))
          .as("rec_hash"))
      .orderBy(col("c_custkey")).limit(500)

  /** F17 JSON extraction + validity over events.props. */
  private def fxJson(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        isValidJson(col("props")).as("json_ok"))
      .orderBy(col("event_id")).limit(1000)

  /** F6 numeric coercion of stringified columns. */
  private def fxCoerce(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        coerceLong(col("l_orderkey").cast("string")).as("as_long"),
        coerceDouble(col("l_quantity").cast("string")).as("as_double"),
        coerceLong(col("l_returnflag")).as("not_numeric"),
        isNumeric(col("l_quantity").cast("string")).as("is_num"),
        isNumeric(col("l_returnflag")).as("is_num_flag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("as_double"))
      .limit(1000)

  /** F1 null standardization: '' → null. */
  private def fxNullStd(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        standardizeNullString(
          when(col("l_linenumber") % 3 === 0, lit(""))
            .otherwise(col("l_returnflag"))).as("flag_or_null"),
        col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      .limit(1000)

  /** F19 normalization renames (id→record_id etc.). */
  private def f19Rename(s: SparkSession, dir: String): DataFrame =
    Normalization()(
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey").as("id"),
          col("o_orderpriority").as("name"),
          col("o_orderdate").as("created")))
      .orderBy(col("record_id")).limit(500)

  /** O1 flagship: the full Cleaning transformer over a synthesized dirty
    * frame — trim, email lowercase, title-case status, phone
    * normalization, numeric coercion, null standardization at once. */
  private def tCleanPipeline(s: SparkSession, dir: String): DataFrame = {
    val dirty = Tables.load(s, dir, "customer")
      .select(col("c_custkey"),
        concat(lit("  "), col("c_name"), lit("  ")).as("name"),
        concat(lit(" "), upper(regexp_replace(lower(col("c_name")),
          "[^a-z0-9]", "")), lit("@EXAMPLE.COM ")).as("email"),
        (lit(5550000000L) + col("c_custkey")).cast("string").as("phone"),
        concat(lit(""), (col("c_custkey") % 90 + 10).cast("string")).as("age"),
        when(col("c_custkey") % 7 === 0, lit(""))
          .otherwise(lower(col("c_mktsegment"))).as("status"))
    Cleaning(coerce = Map("age" -> "long"), stamp = Stamp.off)(dirty)
      .orderBy(col("c_custkey")).limit(500)
  }

  /** Enrichment transformer: age, postal extraction, record hash
    * (asOf frozen for determinism). */
  private def tEnrich(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"),
        col("o_orderpriority").as("name"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("birth_date"),
        // street number kept short so the postal regex's first
        // five-digit hit is the zip, not the street number
        concat(lit("No. "), col("o_orderkey") % 100,
          lit(" Main St, Springfield "),
          lpad((col("o_orderkey") % 100000).cast("string"), 5, "0"))
          .as("address"))
    Enrichment(Stamp.off, asOfDate = Some("2026-01-01"))(base)
      .orderBy(col("o_orderkey")).limit(500)
  }

  /** F21 date-range generator: per-order 3-day window exploded to one
    * row per day (sequence + explode). */
  private def f21DateRange(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"),
        explode(dateRange(col("o_orderdate"),
          col("o_orderdate") + expr("INTERVAL 2 DAY"))).as("d"))
      .orderBy(col("o_orderkey"), col("d"))

  /** PII scrub (training-data extension): deterministic synthetic PII
    * appended to each document, redacted by the regexp chain; md5 of the
    * scrubbed text makes the compare exact on the full string. */
  private def tScrub(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        concat(col("text"), lit(" reach user"), col("doc_id"),
          lit("@ex-mail.com or 555-123-4567 ssn 987-65-4321")).as("__t"))
      .select(col("doc_id"),
        md5(graft.functions.scalars.scrubPii(col("__t"))).as("scrubbed_md5"),
        (length(col("__t")) -
          length(graft.functions.scalars.scrubPii(col("__t"))))
          .as("chars_redacted"))
      .orderBy(col("doc_id")).limit(500)

  /** F+ — fuzzy match candidates: near-identical name pairs by edit
    * distance, the classic entity-resolution primitive the reference's
    * exact record-hash dedup (`common_utils.py:176-186`) cannot
    * express. The quadratic self-join is bounded to a broadcastable
    * key slice here; the scale path is blocking (sorted-neighborhood
    * or the n-gram/LSH families in graft.dedup) with edit distance
    * only verifying candidate pairs — never all pairs. */
  private def fxFuzzy(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
      .filter(col("c_custkey") < 200)
      .select(col("c_custkey"), col("c_name"))
    val a = c.select(col("c_custkey").as("k1"), col("c_name").as("n1"))
    val b = c.select(col("c_custkey").as("k2"), col("c_name").as("n2"))
    a.join(broadcast(b), col("k1") < col("k2") &&
        levenshtein(col("n1"), col("n2")) <= 1)
      .select(col("k1"), col("k2"),
        levenshtein(col("n1"), col("n2")).cast("long").as("dist"))
      .orderBy(col("k1"), col("k2"))
  }

  /** O1's distinctive semantics, judged (`data_transformers.py:297-311`):
    * record-level error isolation. Two stages run over a frame with
    * planted per-row failures — a non-numeric age string every 11th row
    * (the Python `int(value)` throw) and a zero divisor every 5th (the
    * division-by-zero throw). The contract under judgment: failing rows
    * are NEVER dropped, keep their pre-stage values, and accumulate
    * `"<transformer>: <error>"` in `_transformation_errors` — while
    * clean rows take both stages' outputs. */
  private def o1Base(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")
      .select(col("c_custkey"),
        when(col("c_custkey") % 11 === 0, lit("4x2"))
          .otherwise((col("c_custkey") % 90 + 10).cast("string"))
          .as("age_str"),
        (col("c_custkey") % 5).cast("double").as("divisor"))

  private val o1Stages = Seq(
    IsolatedStage("Data Cleaning Transformer",
      error = concat(lit("invalid literal for int(): '"),
        col("age_str"), lit("'")),
      fails = col("age_str").isNotNull &&
        col("age_str").try_cast("long").isNull,
      outputs = Map("age" -> col("age_str").try_cast("long"))),
    IsolatedStage("Data Enrichment Transformer",
      error = lit("division by zero"),
      fails = col("divisor") === 0.0,
      outputs = Map("ratio" -> lit(100.0) / col("divisor"))))

  private def o1ErrorIsolation(s: SparkSession, dir: String): DataFrame =
    ErrorIsolation.run(o1Base(s, dir), o1Stages)
      .select(col("c_custkey"), col("age"),
        round(col("ratio"), 6).as("ratio"),
        size(col(ErrorIsolation.ErrorsCol)).as("n_errors"),
        array_join(col(ErrorIsolation.ErrorsCol), " | ").as("errors_str"))
      .orderBy(col("c_custkey")).limit(1000)

  /** The rollup view of the same run: rows out (= rows in — the
    * never-drop contract as a judged number), clean rows, and per-stage
    * error counts recovered from the message prefixes. */
  private def o1StageCounts(s: SparkSession, dir: String): DataFrame =
    ErrorIsolation.stageCounts(
      ErrorIsolation.run(o1Base(s, dir), o1Stages), o1Stages)

  def queries: Map[String, Q] = Map(
    "o1_error_isolation" -> (o1ErrorIsolation _),
    "o1_stage_counts" -> (o1StageCounts _),
    "fx_fuzzy" -> (fxFuzzy _),
    "t_scrub" -> (tScrub _),
    "f21_date_range" -> (f21DateRange _),
    "fx_strings" -> (fxStrings _),
    "fx_phone" -> (fxPhone _),
    "fx_dates" -> (fxDates _),
    "fx_detect" -> (fxDetect _),
    "fx_hash" -> (fxHash _),
    "fx_unaccent" -> (fxUnaccent _),
    "fx_json" -> (fxJson _),
    "fx_coerce" -> (fxCoerce _),
    "fx_nullstd" -> (fxNullStd _),
    "f19_rename" -> (f19Rename _),
    "t_clean_pipeline" -> (tCleanPipeline _),
    "t_enrich" -> (tEnrich _)
  )

  def oracleSql: Map[String, String] = Map(
    "o1_error_isolation" ->
      """WITH b AS (SELECT c_custkey,
        |    CASE WHEN c_custkey % 11 = 0 THEN '4x2'
        |      ELSE CAST(c_custkey % 90 + 10 AS VARCHAR) END AS age_str,
        |    CAST(c_custkey % 5 AS DOUBLE) AS divisor
        |  FROM customer),
        |e AS (SELECT c_custkey, age_str, divisor,
        |    TRY_CAST(age_str AS BIGINT) AS age,
        |    (TRY_CAST(age_str AS BIGINT) IS NULL) AS clean_fail,
        |    (divisor = 0) AS enrich_fail
        |  FROM b)
        |SELECT c_custkey, age,
        |  CASE WHEN enrich_fail THEN NULL
        |    ELSE round(100.0 / divisor, 6) END AS ratio,
        |  CAST(CASE WHEN clean_fail THEN 1 ELSE 0 END
        |    + CASE WHEN enrich_fail THEN 1 ELSE 0 END AS INT) AS n_errors,
        |  concat_ws(' | ',
        |    CASE WHEN clean_fail THEN
        |      'Data Cleaning Transformer: invalid literal for int(): '''
        |        || age_str || '''' END,
        |    CASE WHEN enrich_fail THEN
        |      'Data Enrichment Transformer: division by zero' END)
        |    AS errors_str
        |FROM e ORDER BY c_custkey LIMIT 1000""".stripMargin,
    "o1_stage_counts" ->
      """WITH b AS (SELECT c_custkey,
        |    CASE WHEN c_custkey % 11 = 0 THEN '4x2'
        |      ELSE CAST(c_custkey % 90 + 10 AS VARCHAR) END AS age_str,
        |    CAST(c_custkey % 5 AS DOUBLE) AS divisor
        |  FROM customer)
        |SELECT count(*) AS rows_out,
        |  CAST(sum(CASE WHEN TRY_CAST(age_str AS BIGINT) IS NOT NULL
        |    AND divisor <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS rows_clean,
        |  CAST(sum(CASE WHEN TRY_CAST(age_str AS BIGINT) IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT)
        |    AS err_data_cleaning_transformer,
        |  CAST(sum(CASE WHEN divisor = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS err_data_enrichment_transformer
        |FROM b""".stripMargin,
    "fx_fuzzy" ->
      """SELECT a.c_custkey AS k1, b.c_custkey AS k2,
        |  levenshtein(a.c_name, b.c_name) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_custkey < b.c_custkey
        |  AND levenshtein(a.c_name, b.c_name) <= 1
        |WHERE a.c_custkey < 200 AND b.c_custkey < 200
        |ORDER BY k1, k2""".stripMargin,
    "t_scrub" ->
      """WITH t AS (SELECT doc_id,
        |    text || ' reach user' || doc_id ||
        |    '@ex-mail.com or 555-123-4567 ssn 987-65-4321' AS s
        |  FROM documents),
        |sc AS (SELECT doc_id, s, regexp_replace(regexp_replace(
        |    regexp_replace(s,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '[EMAIL]', 'g'),
        |    '\d{3}-\d{2}-\d{4}', '[ID]', 'g'),
        |  '\d{3}-\d{3}-\d{4}', '[PHONE]', 'g') AS scrubbed
        |  FROM t)
        |SELECT doc_id, md5(scrubbed) AS scrubbed_md5,
        |  CAST(length(s) - length(scrubbed) AS INT) AS chars_redacted
        |FROM sc ORDER BY doc_id LIMIT 500""".stripMargin,
    "f21_date_range" ->
      """SELECT o_orderkey, unnest(generate_series(o_orderdate,
        |  o_orderdate + INTERVAL 2 DAY, INTERVAL 1 DAY)) AS d
        |FROM orders WHERE o_orderkey < 100
        |ORDER BY o_orderkey, d""".stripMargin,
    "fx_strings" ->
      """SELECT c_custkey,
        |  lower(c_name) AS lo,
        |  upper(c_mktsegment) AS up,
        |  CAST(length(c_name) AS INT) AS len,
        |  substr(c_name, 10, 4) AS sub,
        |  upper(lower(c_mktsegment)[1:1]) || lower(lower(c_mktsegment)[2:])
        |    AS title,
        |  trim(regexp_replace(chr(9) || ' ' || c_name || ' ',
        |    '[\x00-\x1f]', '', 'g')) AS sane
        |FROM customer ORDER BY c_custkey LIMIT 500""".stripMargin,
    "fx_phone" ->
      """WITH b AS (SELECT c_custkey,
        |    CAST(5550000000 + c_custkey AS VARCHAR) AS p10
        |  FROM customer)
        |SELECT c_custkey,
        |  printf('(%s) %s-%s', substr(p10,1,3), substr(p10,4,3),
        |    substr(p10,7,4)) AS norm10,
        |  printf('+1 (%s) %s-%s', substr(p10,1,3), substr(p10,4,3),
        |    substr(p10,7,4)) AS norm11,
        |  substr(p10,1,5) AS norm_bad,
        |  TRUE AS is_phone10,
        |  FALSE AS is_phone_bad
        |FROM b ORDER BY c_custkey LIMIT 500""".stripMargin,
    "fx_dates" ->
      """SELECT o_orderkey,
        |  CAST(date_part('year', o_orderdate) AS INT) AS y,
        |  CAST(date_part('month', o_orderdate) AS INT) AS m,
        |  CAST(date_part('day', o_orderdate) AS INT) AS d,
        |  CAST(date_part('quarter', o_orderdate) AS INT) AS q,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |    DATE '2002-01-01') AS INT) AS days_to_2002,
        |  CAST(floor(date_diff('day', CAST(o_orderdate AS DATE),
        |    DATE '2026-01-01') / 365.0) AS BIGINT) AS years_age,
        |  strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS iso
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin,
    "fx_detect" ->
      """WITH b AS (SELECT c_custkey,
        |    regexp_replace(lower(c_name), '[^a-z0-9]', '', 'g')
        |      || '@example.com' AS email_ok,
        |    c_mktsegment AS email_bad,
        |    'https://example.com/c/' || c_custkey AS url_ok,
        |    '2023-01-15' AS date_s
        |  FROM customer)
        |SELECT c_custkey,
        |  TRUE AS email_valid, FALSE AS bad_valid,
        |  TRUE AS url_valid, TRUE AS date_valid,
        |  'email' AS t_email, 'url' AS t_url, 'date' AS t_date,
        |  CASE WHEN length(regexp_replace(email_bad, '\D', '', 'g'))
        |         BETWEEN 10 AND 15 THEN 'phone' ELSE 'string' END AS t_plain
        |FROM b ORDER BY c_custkey LIMIT 500""".stripMargin,
    "fx_unaccent" ->
      """SELECT c_custkey,
        |  translate(lower(c_name), 'aeioun', 'áéíóüñ') AS accented,
        |  strip_accents(translate(lower(c_name), 'aeioun', 'áéíóüñ'))
        |    AS plain
        |FROM customer ORDER BY c_custkey LIMIT 500""".stripMargin,
    "fx_hash" ->
      """SELECT c_custkey,
        |  md5(CAST(c_custkey AS VARCHAR) || c_name || c_mktsegment)
        |    AS rec_hash
        |FROM customer ORDER BY c_custkey LIMIT 500""".stripMargin,
    "fx_json" ->
      """SELECT event_id, json_extract(props, '$.k')::BIGINT AS k,
        |  json_valid(props) AS json_ok
        |FROM events ORDER BY event_id LIMIT 1000""".stripMargin,
    "fx_coerce" ->
      """SELECT l_orderkey, l_linenumber,
        |  TRY_CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS as_long,
        |  TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS as_double,
        |  TRY_CAST(l_returnflag AS BIGINT) AS not_numeric,
        |  TRUE AS is_num,
        |  FALSE AS is_num_flag
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, as_double LIMIT 1000""".stripMargin,
    "fx_nullstd" ->
      """SELECT l_orderkey, l_linenumber,
        |  nullif(CASE WHEN l_linenumber % 3 = 0 THEN ''
        |    ELSE l_returnflag END, '') AS flag_or_null,
        |  l_returnflag
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_returnflag LIMIT 1000""".stripMargin,
    "f19_rename" ->
      """SELECT o_orderkey AS record_id, o_orderpriority AS full_name,
        |  o_orderdate AS created_at
        |FROM orders ORDER BY record_id LIMIT 500""".stripMargin,
    "t_clean_pipeline" ->
      """WITH dirty AS (SELECT c_custkey,
        |    '  ' || c_name || '  ' AS name,
        |    ' ' || upper(regexp_replace(lower(c_name), '[^a-z0-9]', '', 'g'))
        |      || '@EXAMPLE.COM ' AS email,
        |    CAST(5550000000 + c_custkey AS VARCHAR) AS phone,
        |    CAST(c_custkey % 90 + 10 AS VARCHAR) AS age,
        |    CASE WHEN c_custkey % 7 = 0 THEN ''
        |      ELSE lower(c_mktsegment) END AS status
        |  FROM customer)
        |SELECT c_custkey,
        |  trim(name) AS name,
        |  lower(trim(email)) AS email,
        |  printf('(%s) %s-%s', substr(phone,1,3), substr(phone,4,3),
        |    substr(phone,7,4)) AS phone,
        |  TRY_CAST(age AS BIGINT) AS age,
        |  CASE WHEN status = '' THEN NULL
        |    ELSE upper(status[1:1]) || lower(status[2:]) END AS status
        |FROM dirty ORDER BY c_custkey LIMIT 500""".stripMargin,
    "t_enrich" ->
      """WITH b AS (SELECT o_orderkey,
        |    o_orderpriority AS name,
        |    strftime(o_orderdate, '%Y-%m-%d') AS birth_date,
        |    'No. ' || (o_orderkey % 100) || ' Main St, Springfield ' ||
        |      lpad(CAST(o_orderkey % 100000 AS VARCHAR), 5, '0') AS address
        |  FROM orders)
        |SELECT o_orderkey, name, birth_date, address,
        |  CAST(floor(date_diff('day', CAST(birth_date AS DATE),
        |    DATE '2026-01-01') / 365.0) AS BIGINT) AS calculated_age,
        |  lpad(CAST(o_orderkey % 100000 AS VARCHAR), 5, '0')
        |    AS extracted_postal_code,
        |  md5(name) AS _record_hash
        |FROM b ORDER BY o_orderkey LIMIT 500""".stripMargin
  )
}
