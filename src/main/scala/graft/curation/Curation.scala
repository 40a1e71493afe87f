package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * sampling, mixture control, global shuffle, benchmark decontamination,
  * curriculum binning.
  *
  * Scale design: sampling and shuffling are keyed-hash transforms — no
  * RNG state, no driver coordination, reproducible under retries and
  * speculative execution (a `rand()` sample changes under task retry; a
  * hash sample never does). Decontamination broadcasts the benchmark
  * side (eval sets are tiny next to a 100 TB corpus), so the scan stays
  * shuffle-free.
  */
object Curation {

  /** Portable 28-bit uniform hash in [0, 100): both Spark and ANSI SQL
    * (DuckDB `CAST('0x'||substr(md5(…),1,7) AS BIGINT)`) compute the
    * identical value, so sampling decisions are reproducible across
    * engines. `salt` namespaces independent sampling decisions. */
  def hashPct(salt: String, key: Column): Column =
    pmod(conv(substring(md5(concat(lit(salt), lit("|"),
      key.cast("string"))), 1, 7), 16, 10).cast("long"), lit(100L))

  /** Deterministic Bernoulli sample: keep rows whose keyed hash lands
    * under `pct`. A pure filter — embarrassingly parallel, no shuffle,
    * no RNG; the same rows survive on any cluster, any retry. */
  def sampleByHash(df: DataFrame, keyCol: String, salt: String,
      pct: Int): DataFrame =
    df.filter(hashPct(salt, col(keyCol)) < pct)

  /** Stratified deterministic sample: per-stratum percentage (data
    * mixing — e.g. downsample web, upsample low-resource languages).
    * Strata absent from `rates` keep `defaultPct`. Still a pure filter. */
  def sampleStratified(df: DataFrame, keyCol: String, stratumCol: String,
      salt: String, rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashPct(salt, col(keyCol)) < rate)
  }

  /** Quality-weighted deterministic sampling: each row's keep
    * probability is its own `ratePct` column (0–100) — the "keep
    * high-quality documents preferentially" primitive (rate = a
    * quality score mapped to a percentage), still a pure shuffle-free
    * filter with hash-determinism: the same doc makes the same
    * decision on any cluster, any rerun, any subset. Rates clamp to
    * [0, 100]. */
  def sampleByWeight(df: DataFrame, keyCol: String, salt: String,
      ratePct: Column): DataFrame =
    df.filter(hashPct(salt, col(keyCol)) <
      least(greatest(ratePct, lit(0)), lit(100)))

  /** Temperature-scaled domain mixture: resample so the corpus mixture
    * follows p_i ∝ n_i^alpha — the pretraining data-mix primitive
    * (alpha < 1 flattens the distribution toward low-resource domains;
    * alpha = 1 is a no-op; alpha = 0 targets uniform). Downsample-only:
    * the domain with the largest n^(alpha−1) (the SMALLEST domain when
    * alpha < 1) keeps everything and every other domain keeps
    * rate_i = (n_i / n_ref)^(alpha−1), so no row is ever duplicated.
    *
    * Determinism/portability: membership is a keyed-hash Bernoulli at
    * parts-per-million resolution (the 28-bit md5 bridge mod 1e6, same
    * value in any engine). alpha = 0.5 computes the rate via `sqrt`,
    * which IEEE-754 REQUIRES to be correctly rounded — bit-identical
    * across engines — while generic `pow` is only ~1 ulp; rates are
    * additionally rounded to 6 dp before the compare so a last-ulp
    * libm disagreement cannot flip a row.
    *
    * Scale: one domain-count aggregate (domain-bounded), rates
    * broadcast back onto the scan, then a pure filter — the corpus
    * itself never shuffles. */
  def temperatureMixture(df: DataFrame, domainCol: String, keyCol: String,
      salt: String, alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"need alpha in [0,1], got $alpha")
    require(!df.columns.contains("__rate"), "column __rate is reserved")
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("__n"))
    val nRef = counts.agg(min(col("__n")).as("__nref"))
    val ratio = col("__nref").cast("double") / col("__n")  // ≤ 1
    val rate = alpha match {
      case 1.0 => lit(1.0)
      case 0.5 => sqrt(ratio)
      case 0.0 => ratio
      case a   => pow(ratio, 1.0 - a)
    }
    val rates = counts.crossJoin(broadcast(nRef))
      .select(col(domainCol), round(rate, 6).as("__rate"))
    val ppm = pmod(conv(substring(md5(concat(lit(salt), lit("|"),
      col(keyCol).cast("string"))), 1, 7), 16, 10).cast("long"),
      lit(1000000L))
    // long-vs-double compare on purpose: a cast of rate·1e6 to integer
    // TRUNCATES in Spark but ROUNDS in DuckDB — comparing in double
    // space sidesteps the entire class of cast-direction mismatches
    df.join(broadcast(rates), Seq(domainCol))
      .filter(ppm < col("__rate") * 1e6)
      .drop("__rate")
  }

  /** Deterministic train/val/test split assignment: each key's 28-bit
    * hash lands in exactly one band of the cumulative percentage layout
    * (e.g. train [0,90), val [90,95), test [95,100)). A pure projection
    * — no shuffle, no RNG — so membership is stable across clusters,
    * retries, and reruns, and a document can NEVER migrate between
    * train and eval when the corpus is re-processed (the leakage mode
    * an unseeded random split invites). `salt` isolates the split
    * decision from any sampling decision made with the same keys. */
  def assignSplit(df: DataFrame, keyCol: String, salt: String,
      splits: Seq[(String, Int)], splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      s"split percentages must sum to 100, got $splits")
    val h = hashPct(salt, col(keyCol))
    val upper = splits.scanLeft(0) { case (acc, (_, pct)) => acc + pct }.tail
    val assign = splits.zip(upper).init
      .foldRight(lit(splits.last._1): Column) { case (((name, _), hi), acc) =>
        when(h < hi, lit(name)).otherwise(acc)
      }
    df.withColumn(splitCol, assign)
  }

  /** TEMPORAL holdout split: within each entity's timeline, the last
    * `testFrac` of records (by event time) become "test" — the
    * forecasting / recommendation evaluation protocol, where a random
    * split ([[assignSplit]]) silently leaks the future into training.
    * Deterministic via `percent_rank` with an explicit unique
    * tiebreaker. Scale: one window shuffle on the entity key — the
    * history length per key bounds the sort run, not the corpus. */
  def assignTemporalSplit(df: DataFrame, groupCol: String, tsCol: String,
      tieCol: String, testFrac: Double = 0.2,
      splitCol: String = "split"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(tsCol), col(tieCol))
    df.withColumn(splitCol,
      when(percent_rank().over(w) < 1.0 - testFrac, lit("train"))
        .otherwise(lit("test")))
  }

  /** Deterministic global shuffle: order by a keyed hash. Executes as a
    * distributed range sort (sample → range-partition → local sort) —
    * the standard "shuffle the corpus before sharding" step, with no
    * single-partition window or driver-side permutation anywhere. Full
    * md5 string (not the 28-bit slice) so key collisions — ties that
    * would make the permutation nondeterministic — are negligible. */
  def shuffleKey(salt: String, key: Column): Column =
    md5(concat(lit(salt), lit("|"), key.cast("string")))

  /** Deterministic k-per-group sample ("take k docs per source/lang"):
    * the k smallest keyed hashes win, which is a uniform without-
    * replacement draw per group — the distributed, rerun-stable twin of
    * reservoir sampling (a reservoir's result depends on encounter
    * order; this depends only on the key set). Runs through the salted
    * two-phase top-k (`Scale.groupedTopK`), so low-cardinality groups
    * (the common case: a handful of sources) don't serialize onto one
    * task each. */
  def sampleKPerGroup(df: DataFrame, groupCol: String, keyCol: String,
      salt: String, k: Int): DataFrame =
    graft.plans.Scale.groupedTopK(df, Seq(groupCol),
        Seq(shuffleKey(salt, col(keyCol)).asc, col(keyCol).asc), k)
      .drop("rank")

  /** Balanced class rebalancing: downsample every class to the size of
    * the SMALLEST class — the classifier-training mix fix — with the
    * cap derived from the data itself (one aggregate), not hand-picked
    * like [[sampleKPerGroup]]'s k. Selection within a class is the
    * smallest keyed hashes (deterministic, rerun-stable, oracle-
    * replayable). Scale: one count aggregate, a 1-row broadcast of the
    * cap, and one window shuffle on the class key; with few huge
    * classes the per-class sort serializes — the price of an exact
    * cap (a `hashPct`-style rate filter is the approximate fallback
    * when classes are web-scale). */
  def rebalanceToMinority(df: DataFrame, classCol: String, keyCol: String,
      salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!df.columns.contains("__rk") && !df.columns.contains("__cap"),
      "columns __rk/__cap are reserved")
    val cap = df.groupBy(col(classCol)).agg(count(lit(1)).as("__n"))
      .agg(min(col("__n")).as("__cap"))
    val w = Window.partitionBy(col(classCol))
      .orderBy(shuffleKey(salt, col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .crossJoin(broadcast(cap))
      .filter(col("__rk") <= col("__cap"))
      .drop("__rk", "__cap")
  }

  /** DSIR-style importance weighting (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", 2023,
    * arXiv:2302.03169): score every document by how much more likely
    * its token-bucket profile is under a TARGET domain than under the
    * RAW corpus — the data-selection primitive that upsamples
    * target-like web text without a trained classifier. Tokens hash
    * into a FIXED `buckets`-ary feature space via the portable md5
    * bridge (so an ANSI-SQL oracle replays every weight bit-for-bit);
    * both histograms get add-1 smoothing; a document's log-weight is
    * Σ over its tokens of ln p_target(bucket)/p_raw(bucket), and
    * `selected` is the CONSTANT threshold logw > 0 ("more target-like
    * than raw").
    *
    * Scale shape: the two histograms are ≤ `buckets` rows each (the
    * log-ratio table broadcasts); per-doc work is Θ(tokens) narrow
    * inside the scan stage plus ONE doc-keyed shuffle; the constant
    * selection threshold means no global sort, window, or quantile
    * pass gates the output — the whole pipeline is two tiny aggregates
    * and one hash aggregate at the document grain. `targetPred`
    * parameterizes the target sample as a predicate over the same
    * frame; at 100 TB it would instead come from a small curated
    * corpus — only the two histogram inputs change. */
  /** (id, __tgt, __bkt) token-bucket rows — the shared front end of
    * the DSIR family: whitespace tokens hashed into `buckets` ids via
    * the md5 bridge, all narrow inside the scan stage. */
  private def tokenBuckets(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int): DataFrame =
    // widened input (no-op at production scan parallelism): the
    // per-token md5 bucketing is the DSIR family's expensive stage,
    // and the local one-row-group lake file scans as ONE partition
    graft.plans.Scale.widen(df)
      .select(col(idCol).as("id"), targetPred.as("__tgt"),
        explode(graft.text.TextAnalysis.tokens(col(textCol))).as("__t"))
      .select(col("id"), col("__tgt"),
        pmod(conv(substring(md5(col("__t")), 1, 7), 16, 10).cast("long"),
          lit(buckets.toLong)).as("__bkt"))

  /** Both histograms in ONE aggregate pass over the token stream
    * (raw count + conditional target count per bucket), collected as
    * ≤ `buckets` driver rows: (bucket, c_raw, c_tgt). The k×dim
    * literal pattern (`dedup_semantic`'s codebook) applied to DSIR —
    * the decision model is small enough to BE the plan. */
  private def dsirHistogram(b: DataFrame, buckets: Int)
      : Seq[(Long, Long, Long)] =
    b.groupBy(col("__bkt"))
      .agg(count(lit(1)).as("__c_r"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("__c_t"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  /** (bucket → smoothed log-ratio) for EVERY bucket, computed on the
    * driver from the one-pass histogram — identical IEEE doubles to
    * the former in-plan formula (same ops, same order). */
  private def llrTable(hist: Seq[(Long, Long, Long)],
      buckets: Int): Map[Long, Double] = {
    val byBkt = hist.map(h => h._1 -> h).toMap
    val nR = hist.map(_._2).sum.toDouble
    val nT = hist.map(_._3).sum.toDouble
    (0L until buckets.toLong).map { b =>
      val (_, cR, cT) = byBkt.getOrElse(b, (b, 0L, 0L))
      b -> math.log(((cT + 1L) / (nT + buckets)) /
        ((cR + 1L) / (nR + buckets)))
    }.toMap
  }

  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 256): DataFrame = {
    val b = tokenBuckets(df, idCol, textCol, targetPred, buckets)
    val llr = llrTable(dsirHistogram(b, buckets), buckets)
    // scoring is ONE pass: the log-ratio table rides as a map literal
    // (≤ `buckets` doubles), so the whole plan is scan → project →
    // one doc-keyed aggregate — no join, no second histogram job
    b.select(col("id"),
        element_at(typedLit(llr), col("__bkt")).as("__llr"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("__llr")), 6).as("logw"))
      .withColumn("selected", col("logw") > 0)
  }

  /** The FROZEN artifact of the DSIR family: EXACTLY `buckets` rows of
    * (__bkt, __llr) — smoothed target/raw log-ratios with every bucket
    * materialized, so scoring a stream that contains buckets the
    * reference corpus never produced still resolves (to the pure
    * smoothing ratio ln((n_r+B)/(n_t+B))) instead of silently dropping
    * tokens. Train it ONCE over a reference period, persist it, and
    * score any later batch/stream against it without rescanning the
    * reference — the decision model is ≤ `buckets` rows of state, the
    * same frozen-artifact contract as the IVF codebook. */
  def dsirTable(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val b = tokenBuckets(df, idCol, textCol, targetPred, buckets)
    llrTable(dsirHistogram(b, buckets), buckets)
      .toSeq.sortBy(_._1)
      .toDF("__bkt", "__llr")
  }

  /** Score documents against a trained [[dsirTable]]: per-doc work is
    * Θ(tokens) + one broadcast join against the ≤ `buckets`-row table
    * + one doc-keyed aggregate — the reference corpus is never
    * touched. Output matches [[dsirWeights]]: (id, n_tokens, logw,
    * selected). */
  def dsirScore(df: DataFrame, idCol: String, textCol: String,
      table: DataFrame, buckets: Int = 256): DataFrame =
    tokenBuckets(df, idCol, textCol, lit(false), buckets)
      .join(broadcast(table), Seq("__bkt"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("__llr")), 6).as("logw"))
      .withColumn("selected", col("logw") > 0)

  /** Benchmark decontamination: flag corpus docs sharing any n-gram
    * shingle with the benchmark set. Returns (id, n_shared) per
    * contaminated doc. The benchmark shingle set is broadcast —
    * corpus-side stays a shuffle-free scan + partial-agg on id. */
  def contaminated(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    // per-doc set semantics computed row-local: a global .distinct()
    // here would exchange every corpus shingle string only to drop
    // within-doc repeats (ids are unique per doc). Callers whose corpus
    // is a raw narrow scan should pass it through Scale.widen — the
    // probe is NOT taken here because corpus may arrive as a complex
    // derived frame (cur_pipeline's deduped chain), where the
    // partition-count probe re-plans the subtree for nothing.
    val corpusSh = graft.text.TextAnalysis
      .distinctShingleRows(corpus, idCol, textCol, n)
    val benchSh = graft.text.TextAnalysis
      .shingleRows(bench, idCol, textCol, n)
      .select(col("shingle")).distinct()
    corpusSh.join(broadcast(benchSh), Seq("shingle"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Scoring sibling of [[contaminated]]: instead of the boolean
    * "shares ≥1 shingle", every corpus document gets its overlap
    * FRACTION — distinct shingles shared with the benchmark set over
    * distinct shingles total. The number thresholding policies are
    * written against (e.g. "drop > 10% overlap, flag > 1%") — a raw
    * hit count can't distinguish a 10-shingle tweet quoting a
    * benchmark line from a book with one coincidental trigram. Same
    * plan shape as the boolean: broadcast benchmark shingles, one
    * per-doc aggregate; zero-overlap docs are kept (score 0), docs
    * with no shingles (< n tokens) have no denominator and drop. */
  def contaminationScore(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    // row-local per-doc dedupe, same reasoning as [[contaminated]]
    // (incl. the caller-side widen contract)
    val corpusSh = graft.text.TextAnalysis
      .distinctShingleRows(corpus, idCol, textCol, n)
    val benchSh = graft.text.TextAnalysis
      .shingleRows(bench, idCol, textCol, n)
      .select(col("shingle")).distinct()
    corpusSh
      .join(broadcast(benchSh.withColumn("__hit", lit(1))),
        Seq("shingle"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0))).as("n_shared"))
      .withColumn("overlap", round(col("n_shared") / col("n_shingles"), 4))
  }

  /** Curriculum binning: per-stratum quality quantiles via `ntile` —
    * each stratum sorts independently (bounded by stratum size, never a
    * global single-partition window). Ties broken by id for a
    * deterministic, engine-portable assignment. */
  def curriculumBins(df: DataFrame, stratumCol: String, scoreCol: Column,
      idCol: String, bins: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(scoreCol.asc, col(idCol).asc)
    df.withColumn("__bin", ntile(bins).over(w))
  }
}
