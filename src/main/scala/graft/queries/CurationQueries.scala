package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.curation.Curation

/** Corpus-curation operators (training-data pipeline extensions):
  * deterministic hash sampling, stratified mixing, global shuffle,
  * benchmark decontamination, curriculum binning — every one
  * oracle-checked via the portable md5-bridge hash (identical values in
  * Spark and DuckDB). */
object CurationQueries extends QuerySection {
  import Catalog.Q

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Deterministic 10% Bernoulli sample — a pure filter (no shuffle, no
    * RNG): the same rows survive on any cluster, any retry. */
  private def curSampleHash(s: SparkSession, dir: String): DataFrame =
    Curation.sampleByHash(docs(s, dir), "doc_id", "smp", 10)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  /** Stratified mixing: downsample English to 20%, keep low-resource
    * languages at 80% — the data-mixing primitive. Judged on per-stratum
    * counts so the mixture itself is what's compared. */
  private def curSampleStratified(s: SparkSession, dir: String): DataFrame =
    Curation.sampleStratified(docs(s, dir), "doc_id", "lang", "mix",
        rates = Map("en" -> 20), defaultPct = 80)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
      .orderBy(col("lang"))

  /** Deterministic global corpus shuffle: distributed range sort on a
    * keyed hash (sample → range-partition → local sort); no
    * single-partition window, no driver-side permutation. */
  private def curShuffle(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        Curation.shuffleKey("shuf", col("doc_id")).as("skey"))
      .orderBy(col("skey"))
      .limit(200)

  /** Benchmark decontamination: corpus docs sharing any 3-gram shingle
    * with the (broadcast) benchmark set, with the shared-shingle count.
    * The benchmark here is the deterministic pseudo-eval slice
    * doc_id % 97 == 0. */
  private def curDecontam(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val bench = d.filter(col("doc_id") % 97 === 0)
    // corpus widened (no-op at production scan parallelism): the
    // tokenize+shingle stage over the local one-partition lake scan is
    // the query's cost (Scale.widen)
    val corpus = graft.plans.Scale.widen(d.filter(col("doc_id") % 97 =!= 0))
    Curation.contaminated(corpus, bench, "doc_id", "text", n = 3)
      .select(col("id").as("doc_id"), col("n_shared"))
      .orderBy(col("doc_id"))
  }

  /** DSIR importance weighting judged ([[Curation.dsirWeights]]): the
    * target domain is the English slice, the raw distribution is the
    * whole corpus, 256 hashed token buckets — every per-document
    * log-weight and the constant-threshold selection replayed by the
    * oracle bit-for-bit through the md5 bridge. */
  private def curDsir(s: SparkSession, dir: String): DataFrame =
    Curation.dsirWeights(docs(s, dir), "doc_id", "text",
        col("lang") === "en")
      .select(col("id").as("doc_id"), col("n_tokens"), col("logw"),
        col("selected"))
      .orderBy(col("doc_id"))

  /** Contamination overlap SCORE (thresholdable fraction, not the
    * boolean): same bench/corpus split as cur_decontam, every corpus
    * doc scored shared/total distinct trigrams. */
  private def curOverlap(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val bench = d.filter(col("doc_id") % 97 === 0)
    // corpus widened — see curDecontam
    val corpus = graft.plans.Scale.widen(d.filter(col("doc_id") % 97 =!= 0))
    Curation.contaminationScore(corpus, bench, "doc_id", "text", n = 3)
      .select(col("id").as("doc_id"), col("n_shingles"), col("n_shared"),
        col("overlap"))
      .orderBy(col("doc_id"))
  }

  /** Curriculum binning: per-language quality quartiles (ntile over the
    * language stratum — bounded partitions, never a global window),
    * rolled up to (lang, bin) with order-insensitive bounds. */
  private def curCurriculum(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextAnalysis
    // tokens materialized ONCE per doc: the interpreted HOF ratios
    // reference the token arrays several times and get no CSE, so the
    // inline form re-splits the text per reference (measured ~10×)
    val scored = docs(s, dir)
      .select(col("doc_id"), col("lang"), col("text"),
        TextAnalysis.tokens(col("text")).as("__t"),
        TextAnalysis.tokens(lower(col("text"))).as("__lt"))
      .select(col("doc_id"), col("lang"),
        round(TextAnalysis.qualityScoreOfTokens(
          col("text"), col("__t"), col("__lt")), 6).as("q"))
    Curation.curriculumBins(scored, "lang", col("q"), "doc_id", bins = 4)
      .groupBy(col("lang"), col("__bin").cast("long").as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("q")).as("min_q"), max(col("q")).as("max_q"))
      .orderBy(col("lang"), col("bin"))
  }

  /** The END-TO-END curation pipeline judged as ONE query — the chain
    * a pretraining corpus actually runs, each stage an already-judged
    * operator: quality-score filter (≥ 0.5) → exact dedup (keep
    * lowest id per content hash) → benchmark decontamination (drop
    * docs sharing any trigram with the bench split) → deterministic
    * 90/5/5 split assignment → per-split rollup. Every stage is a
    * projection/aggregate/anti-join — the composition introduces no
    * new shuffle class, which is the point: the full pipeline is as
    * scalable as its worst stage. */
  private def curPipeline(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextAnalysis
    val d = docs(s, dir)
    val bench = d.filter(col("doc_id") % 97 === 0)
    val corpus = d.filter(col("doc_id") % 97 =!= 0)
    val kept = corpus
      .select(col("doc_id"), col("text"), col("n_chars"),
        TextAnalysis.tokens(col("text")).as("__t"),
        TextAnalysis.tokens(lower(col("text"))).as("__lt"))
      .select(col("doc_id"), col("text"), col("n_chars"),
        round(TextAnalysis.qualityScoreOfTokens(
          col("text"), col("__t"), col("__lt")), 6).as("q"))
      .filter(col("q") >= 0.5)
    val deduped = graft.dedup.Dedup.exactDedup(kept, "text", "doc_id")
    val dirty = Curation.contaminated(deduped, bench, "doc_id", "text",
        n = 3)
      .select(col("id").as("doc_id"))
    val clean = deduped.join(dirty, Seq("doc_id"), "left_anti")
    Curation.assignSplit(clean, "doc_id", "tvt",
        Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        round(avg(col("q")), 4).as("avg_q"))
      .orderBy(col("split"))
  }

  /** Deterministic 90/5/5 train/val/test split — hash-banded, pure
    * projection; judged on per-split counts and sizes so the banding
    * itself is compared across engines. */
  private def curSplit(s: SparkSession, dir: String): DataFrame =
    Curation.assignSplit(docs(s, dir), "doc_id", "tvt",
        Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("split"))

  /** Deterministic k-per-group sample: 40 docs per language, smallest
    * keyed hashes win (uniform per-group draw, rerun-stable). Judged on
    * the exact membership — the oracle replays the hash order. */
  private def curSampleGroup(s: SparkSession, dir: String): DataFrame =
    Curation.sampleKPerGroup(docs(s, dir), "lang", "doc_id", "ks", k = 40)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** Minority-class rebalancing: every language downsampled to the
    * smallest language's size, cap data-derived (one aggregate + 1-row
    * broadcast), membership by smallest keyed hash. Judged on the
    * exact kept rows — the oracle replays cap and hash order. */
  private def curRebalance(s: SparkSession, dir: String): DataFrame =
    Curation.rebalanceToMinority(docs(s, dir), "lang", "doc_id", "bal")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** Temperature-scaled domain mixture (alpha = 0.5): resample so the
    * language mix follows p ∝ n^0.5 — the pretraining data-mix move
    * that upweights low-resource languages. Downsample-only (smallest
    * language keeps 100%), membership a ppm-resolution keyed-hash
    * Bernoulli; alpha = 0.5 rates go through `sqrt`, which IEEE
    * requires correctly rounded, so both engines compute bit-identical
    * rates. Judged on the exact kept rows. */
  private def curMixture(s: SparkSession, dir: String): DataFrame =
    Curation.temperatureMixture(docs(s, dir), "lang", "doc_id", "mixT",
        alpha = 0.5)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** Equal-frequency decile binning (`Features.quantileBins`): exact
    * interpolated boundaries from the scan-shaped global-quantile path
    * (no global sort), rounded before comparison so DuckDB's
    * `quantile_cont` bins ties identically; judged on per-bin counts,
    * which must come out ~n/10 each. */
  private def curQuantileBins(s: SparkSession, dir: String): DataFrame =
    graft.curation.Features.quantileBins(
        Tables.load(s, dir, "events"), "value", nBins = 10)
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
      .orderBy(col("bin"))

  /** Robust MAD outlier flags (`Features.madOutliers`): per-event-type
    * median + MAD with Hampel's |v − med| > 3.5·MAD rule — the outlier
    * detector whose reference points can't be dragged by the outliers
    * themselves (contrast [[curZscore]]'s mean/σ). Judged on every
    * row's flag and the per-group scalars. */
  private def curMadOutliers(s: SparkSession, dir: String): DataFrame =
    graft.curation.Features.madOutliers(
        Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value")),
        "event_type", "value")
      .orderBy(col("event_id"))

  /** Per-group z-score normalization of event values (population σ,
    * zero-variance groups → null). */
  private def curZscore(s: SparkSession, dir: String): DataFrame =
    graft.curation.Features.zscore(
        Tables.load(s, dir, "events"), "event_type", "value")
      .select(col("event_id"), round(col("z"), 6).as("z"))
      .orderBy(col("event_id")).limit(2000)

  /** Per-group winsorization into the exact [p05, p95] band. */
  private def curWinsorize(s: SparkSession, dir: String): DataFrame =
    graft.curation.Features.winsorize(
        Tables.load(s, dir, "events"), "event_type", "value", 0.05, 0.95)
      .select(col("event_id"), round(col("clipped"), 4).as("clipped"))
      .orderBy(col("event_id")).limit(2000)

  /** Quality-weighted sampling: keep probability rises with document
    * length (rate = n_chars/5, capped at 100%) — judged on per-lang
    * counts AND the kept side's average length, which must exceed the
    * corpus average if the weighting actually biased the draw. */
  private def curSampleWeighted(s: SparkSession, dir: String): DataFrame =
    Curation.sampleByWeight(docs(s, dir), "doc_id", "wt",
        col("n_chars") / lit(5))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"),
        round(avg(col("n_chars")), 4).as("kept_avg_chars"))
      .orderBy(col("lang"))

  /** Temporal (leakage-free) holdout: each user's LAST 20 % of events
    * by time become test. Judged on per-user split sizes plus the
    * no-leak invariant itself — every user's latest train event must
    * precede their earliest test event. */
  private def curSplitTemporal(s: SparkSession, dir: String): DataFrame =
    Curation.assignTemporalSplit(Tables.load(s, dir, "events"),
        "user_id", "ts", "event_id", testFrac = 0.2)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"),
        (max(when(col("split") === "train", unix_micros(col("ts")))) <
          min(when(col("split") === "test", unix_micros(col("ts")))))
          .as("no_leak"))
      .orderBy(col("user_id"))

  /** Poisson-bootstrap 95% CI of the mean event value per type
    * ([[graft.curation.Features.poissonBootstrapCI]]): 100 replicates
    * in ONE scan — each row explodes 100 deterministic Poisson(1)
    * weights (portable md5 bridge, four 28-bit uniforms sliced per
    * digest so md5 runs R/4 times) straight into a (type, replicate)
    * partial+final aggregate; the CI is the exact 2.5/97.5 percentile
    * of the 100 replicate means, computed over an R-bounded frame.
    * No resample shuffle exists anywhere in the plan. */
  private def curBootstrap(s: SparkSession, dir: String): DataFrame =
    graft.curation.Features.poissonBootstrapCI(
        Tables.load(s, dir, "events"), "event_type", "event_id", "value",
        reps = 100)
      .orderBy(col("event_type"))

  /** ε-DP noisy release of per-type event counts
    * (`Features.dpCountRelease`, ε = 0.5): deterministic Laplace
    * noise from the md5 bridge, judged by replaying the inverse-CDF
    * arithmetic in DuckDB — the release the mechanism would actually
    * publish, true counts never surfacing. */
  private def curDpRelease(s: SparkSession, dir: String): DataFrame =
    graft.curation.Features.dpCountRelease(
        Tables.load(s, dir, "events"), "event_type", epsilon = 0.5)
      .orderBy(col("event_type"))

  def queries: Map[String, Q] = Map(
    "cur_dp_release" -> (curDpRelease _),
    "cur_bootstrap" -> (curBootstrap _),
    "cur_split_temporal" -> (curSplitTemporal _),
    "cur_split" -> (curSplit _),
    "cur_pipeline" -> (curPipeline _),
    "cur_sample_weighted" -> (curSampleWeighted _),
    "cur_sample_group" -> (curSampleGroup _),
    "cur_rebalance" -> (curRebalance _),
    "cur_mixture" -> (curMixture _),
    "cur_quantile_bins" -> (curQuantileBins _),
    "cur_mad_outliers" -> (curMadOutliers _),
    "cur_zscore" -> (curZscore _),
    "cur_winsorize" -> (curWinsorize _),
    "cur_sample_hash" -> (curSampleHash _),
    "cur_sample_stratified" -> (curSampleStratified _),
    "cur_shuffle" -> (curShuffle _),
    "cur_decontam" -> (curDecontam _),
    "cur_dsir" -> (curDsir _),
    "cur_overlap" -> (curOverlap _),
    "cur_curriculum" -> (curCurriculum _)
  )

  /** DuckDB twin of [[Curation.hashPct]]. */
  private def pctSql(salt: String, key: String): String =
    s"CAST('0x' || substr(md5('$salt|' || $key), 1, 7) AS BIGINT) % 100"

  private val qualitySql =
    """round(greatest(0.0, least(1.0,
      |    least(CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)
      |      / 100.0, 1.0) * 0.4 +
      |    least(CASE WHEN len(string_split_regex(trim(lower(text)), '\s+')) > 0
      |      THEN CAST(len(list_filter(string_split_regex(trim(lower(text)),
      |        '\s+'), x -> list_contains(['the', 'a', 'an', 'and', 'or',
      |        'of', 'to', 'in', 'is', 'it', 'that', 'for', 'on', 'with',
      |        'as', 'at', 'by', 'be'], x))) AS DOUBLE)
      |        / len(string_split_regex(trim(lower(text)), '\s+')) * 5.0
      |      ELSE 0.0 END, 1.0) * 0.4 +
      |    (1.0 - least((
      |      CASE WHEN length(text) > 0 THEN
      |        CAST(len(regexp_extract_all(text, '[.,;:!?''"()-]')) AS DOUBLE)
      |          / length(text) ELSE 0.0 END +
      |      CASE WHEN length(text) > 0 THEN
      |        CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
      |          / length(text) ELSE 0.0 END) * 5.0, 1.0)) * 0.2)), 6)"""
      .stripMargin

  def oracleSql: Map[String, String] = Map(
    "cur_dp_release" ->
      """WITH n AS (
        |  SELECT event_type, count(*) AS cnt FROM events GROUP BY 1),
        |u AS (
        |  SELECT event_type, cnt,
        |    CAST(CAST('0x' || substr(md5('dp|' || event_type), 1, 7)
        |      AS BIGINT) AS DOUBLE) / 268435456.0 - 0.5 AS c
        |  FROM n)
        |SELECT event_type, 0.5 AS epsilon,
        |  round(cnt + (-1.0 / 0.5) * sign(c) *
        |    ln(1.0 - 2.0 * least(abs(c), 0.49999999)), 4) AS noisy_n
        |FROM u ORDER BY event_type""".stripMargin,
    "cur_bootstrap" ->
      """WITH e AS (
        |  SELECT event_type, event_id, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL),
        |x AS (
        |  SELECT event_type, blk * 4 + slc AS rep, v,
        |    CAST(CAST('0x' || substr(md5('boot|'
        |        || CAST(event_id AS VARCHAR) || '|'
        |        || CAST(blk AS VARCHAR)), 1 + 7 * slc, 7)
        |      AS BIGINT) AS DOUBLE) / 268435456.0 AS u
        |  FROM e CROSS JOIN (SELECT unnest(range(25)) AS blk)
        |         CROSS JOIN (SELECT unnest(range(4)) AS slc)),
        |w AS (
        |  SELECT event_type, rep, v,
        |    CASE WHEN u < 0.36787944117144233 THEN 0
        |      WHEN u < 0.7357588823428847 THEN 1
        |      WHEN u < 0.9196986029286058 THEN 2
        |      WHEN u < 0.9810118431238462 THEN 3
        |      WHEN u < 0.9963401531726563 THEN 4
        |      WHEN u < 0.9994058151824183 THEN 5
        |      WHEN u < 0.9999167588507119 THEN 6
        |      WHEN u < 0.9999897508033253 THEN 7
        |      WHEN u < 0.9999988885102237 THEN 8
        |      ELSE 9 END AS w
        |  FROM x),
        |m AS (
        |  SELECT event_type, rep, sum(v * w) / sum(w) AS m
        |  FROM w GROUP BY 1, 2),
        |ci AS (
        |  SELECT event_type, quantile_cont(m, 0.025) AS lo,
        |    quantile_cont(m, 0.975) AS hi
        |  FROM m GROUP BY 1),
        |b AS (
        |  SELECT event_type, count(v) AS n, round(avg(v), 4) AS mean
        |  FROM e GROUP BY 1)
        |SELECT b.event_type, n, mean, round(lo, 4) AS ci_lo,
        |  round(hi, 4) AS ci_hi
        |FROM b JOIN ci USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "cur_split_temporal" ->
      """WITH ranked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN percent_rank() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) < 0.8 THEN 'train'
        |    ELSE 'test' END AS split
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_train,
        |  CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_test,
        |  max(CASE WHEN split = 'train' THEN epoch_us(ts) END) <
        |    min(CASE WHEN split = 'test' THEN epoch_us(ts) END)
        |    AS no_leak
        |FROM ranked GROUP BY user_id ORDER BY user_id""".stripMargin,
    "cur_sample_weighted" ->
      s"""SELECT lang, count(*) AS n_kept,
         |  round(avg(n_chars), 4) AS kept_avg_chars
         |FROM documents
         |WHERE ${pctSql("wt", "doc_id")} <
         |  least(greatest(n_chars / 5, 0), 100)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "cur_sample_group" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY md5('ks|' || doc_id), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 40 ORDER BY doc_id""".stripMargin,
    "cur_rebalance" ->
      """WITH cap AS (SELECT min(n) AS m FROM (
        |  SELECT count(*) AS n FROM documents GROUP BY lang))
        |SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY md5('bal|' || doc_id), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= (SELECT m FROM cap)
        |ORDER BY doc_id""".stripMargin,
    "cur_mixture" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents
        |  GROUP BY lang),
        |r AS (SELECT lang, round(sqrt(
        |    CAST((SELECT min(n) FROM c) AS DOUBLE) / n), 6) AS rate
        |  FROM c)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN r USING (lang)
        |WHERE CAST('0x' || substr(md5('mixT|' || d.doc_id), 1, 7)
        |    AS BIGINT) % 1000000 < rate * 1000000
        |ORDER BY d.doc_id""".stripMargin,
    "cur_quantile_bins" ->
      """WITH b AS (SELECT quantile_cont(CAST(value AS DOUBLE),
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS q
        |  FROM events)
        |SELECT bin, count(*) AS n FROM (
        |  SELECT CASE WHEN value IS NOT NULL THEN
        |    CAST(list_sum(list_transform((SELECT q FROM b),
        |      x -> CASE WHEN CAST(value AS DOUBLE) >= round(x, 6)
        |        THEN 1 ELSE 0 END)) AS INTEGER) END AS bin
        |  FROM events)
        |GROUP BY 1 ORDER BY bin""".stripMargin,
    "cur_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(CAST(value AS DOUBLE), 0.5)
        |    AS m
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type),
        |d AS (
        |  SELECT event_id, e.event_type, value, m,
        |    abs(CAST(value AS DOUBLE) - m) AS dev
        |  FROM events e LEFT JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type, quantile_cont(dev, 0.5) AS md
        |  FROM d WHERE dev IS NOT NULL GROUP BY event_type)
        |SELECT event_id, d.event_type, value,
        |  CASE WHEN value IS NOT NULL THEN dev > 3.5 * md END
        |    AS is_outlier,
        |  round(m, 6) AS median, round(md, 6) AS mad
        |FROM d LEFT JOIN mad USING (event_type)
        |ORDER BY event_id""".stripMargin,
    "cur_zscore" ->
      """SELECT event_id,
        |  CASE WHEN stddev_pop(value) OVER w = 0 THEN NULL
        |    ELSE round((value - avg(value) OVER w)
        |      / (stddev_pop(value) OVER w), 6) END AS z
        |FROM events WINDOW w AS (PARTITION BY event_type)
        |ORDER BY event_id LIMIT 2000""".stripMargin,
    "cur_winsorize" ->
      """WITH b AS (
        |  SELECT event_type, quantile_cont(value, 0.05) AS lo,
        |    quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY event_type)
        |SELECT event_id,
        |  round(least(greatest(value, lo), hi), 4) AS clipped
        |FROM events JOIN b USING (event_type)
        |ORDER BY event_id LIMIT 2000""".stripMargin,
    "cur_split" ->
      s"""SELECT CASE WHEN ${pctSql("tvt", "doc_id")} < 90 THEN 'train'
         |  WHEN ${pctSql("tvt", "doc_id")} < 95 THEN 'val'
         |  ELSE 'test' END AS split,
         |  count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM documents GROUP BY 1 ORDER BY split""".stripMargin,
    "cur_sample_hash" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${pctSql("smp", "doc_id")} < 10
         |ORDER BY doc_id""".stripMargin,
    "cur_sample_stratified" ->
      s"""SELECT lang, count(*) AS n_kept FROM documents
         |WHERE ${pctSql("mix", "doc_id")} <
         |  CASE WHEN lang = 'en' THEN 20 ELSE 80 END
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "cur_shuffle" ->
      """SELECT doc_id, md5('shuf|' || doc_id) AS skey FROM documents
        |ORDER BY skey LIMIT 200""".stripMargin,
    "cur_decontam" ->
      """WITH toks AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(tk) >= 3 THEN
        |      list_transform(generate_series(1, len(tk) - 2),
        |        i -> array_to_string(tk[i:i+2], ' '))
        |    ELSE [] END)) AS t
        |  FROM toks),
        |bench AS (SELECT DISTINCT t FROM sh WHERE doc_id % 97 = 0)
        |SELECT doc_id, count(*) AS n_shared
        |FROM sh JOIN bench USING (t)
        |WHERE doc_id % 97 <> 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // per-bucket log-ratio table (≤256 rows) replayed exactly: the
    // 28-bit md5 bridge buckets tokens identically on both engines, and
    // both round the per-doc sum to 6 dp before the threshold test
    "cur_dsir" ->
      """WITH tok AS (SELECT doc_id, lang,
        |    unnest(string_split_regex(trim(text), '\s+')) AS t
        |  FROM documents),
        |b AS (SELECT doc_id, lang,
        |    CAST('0x' || substr(md5(t), 1, 7) AS BIGINT) % 256 AS bkt
        |  FROM tok),
        |raw AS (SELECT bkt, count(*) AS c_r FROM b GROUP BY 1),
        |tgt AS (SELECT bkt, count(*) AS c_t FROM b WHERE lang = 'en'
        |  GROUP BY 1),
        |tot AS (SELECT (SELECT CAST(sum(c_r) AS DOUBLE) FROM raw) AS n_r,
        |    (SELECT CAST(sum(c_t) AS DOUBLE) FROM tgt) AS n_t),
        |lr AS (SELECT bkt,
        |    ln(((coalesce(c_t, 0) + 1) / (n_t + 256.0)) /
        |       ((c_r + 1) / (n_r + 256.0))) AS llr
        |  FROM raw LEFT JOIN tgt USING (bkt) CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(sum(llr), 6) AS logw,
        |  (round(sum(llr), 6) > 0) AS selected
        |FROM b JOIN lr USING (bkt)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "cur_pipeline" ->
      s"""WITH corpus AS (SELECT doc_id, text, n_chars, $qualitySql AS q
        |    FROM documents WHERE doc_id % 97 <> 0),
        |kept AS (SELECT * FROM corpus WHERE q >= 0.5),
        |dedup AS (SELECT * FROM kept QUALIFY row_number()
        |  OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
        |toks AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\\s+') AS tk FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(tk) >= 3 THEN
        |      list_transform(generate_series(1, len(tk) - 2),
        |        i -> array_to_string(tk[i:i+2], ' '))
        |    ELSE [] END)) AS t
        |  FROM toks),
        |benchsh AS (SELECT DISTINCT t FROM sh WHERE doc_id % 97 = 0),
        |dirty AS (SELECT DISTINCT sh.doc_id FROM sh
        |  JOIN benchsh USING (t)),
        |clean AS (SELECT d.* FROM dedup d
        |  LEFT JOIN dirty ON d.doc_id = dirty.doc_id
        |  WHERE dirty.doc_id IS NULL),
        |assigned AS (SELECT *,
        |    CASE WHEN ${pctSql("tvt", "doc_id")} < 90 THEN 'train'
        |      WHEN ${pctSql("tvt", "doc_id")} < 95 THEN 'val'
        |      ELSE 'test' END AS split
        |  FROM clean)
        |SELECT split, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  round(avg(q), 4) AS avg_q
        |FROM assigned GROUP BY split ORDER BY split""".stripMargin,
    "cur_overlap" ->
      """WITH toks AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(tk) >= 3 THEN
        |      list_transform(generate_series(1, len(tk) - 2),
        |        i -> array_to_string(tk[i:i+2], ' '))
        |    ELSE [] END)) AS t
        |  FROM toks),
        |bench AS (SELECT DISTINCT t FROM sh WHERE doc_id % 97 = 0)
        |SELECT s.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(CASE WHEN b.t IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_shared,
        |  round(sum(CASE WHEN b.t IS NOT NULL THEN 1 ELSE 0 END)
        |    / count(*), 4) AS overlap
        |FROM sh s LEFT JOIN bench b ON s.t = b.t
        |WHERE s.doc_id % 97 <> 0
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "cur_curriculum" ->
      s"""WITH scored AS (SELECT doc_id, lang, $qualitySql AS q
         |  FROM documents),
         |binned AS (SELECT lang, q,
         |    ntile(4) OVER (PARTITION BY lang ORDER BY q, doc_id) AS bin
         |  FROM scored)
         |SELECT lang, bin, count(*) AS n_docs,
         |  min(q) AS min_q, max(q) AS max_q
         |FROM binned GROUP BY lang, bin
         |ORDER BY lang, bin""".stripMargin
  )
}
