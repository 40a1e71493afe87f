package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group feature normalization for training-data prep: z-score
  * scaling and quantile clipping (winsorization) — the two standard
  * "tame the numeric column" passes before a feature lands in a
  * training set.
  *
  * Scale shape: z-score is one keyed window exchange (the aggregate
  * moments and the projection share it); winsorization reuses the
  * spillable grouped-percentile path and joins the per-group bounds
  * back — the bounds side is group-cardinality rows, so Catalyst
  * broadcasts it and the data side stays a scan.
  */
object Features {

  /** ε-differentially-private COUNT release: per-group counts with
    * Laplace(1/ε) noise — the governance primitive for publishing
    * usage/cohort statistics off a lake without exposing any single
    * row's presence (count sensitivity = 1, so scale b = 1/ε).
    *
    * The noise is DETERMINISTIC-per-release: the uniform comes from
    * the portable md5 bridge over (salt, group) — same mechanism as
    * the Poisson bootstrap's weights — inverted through the Laplace
    * CDF (`x = −b·sign(u−½)·ln(1−2|u−½|)`). Determinism is what makes
    * a noisy release operationally sane (re-running the job republishes
    * identical numbers, no averaging-attack across retries) and what
    * lets a DP mechanism, of all things, be hash-judged against an
    * oracle. Fresh release ⇒ fresh salt ⇒ fresh ε budget accounting —
    * the caller's ledger, not this function's.
    *
    * Scale: one hash aggregate to group cardinality; the noise is a
    * projection on the aggregate output. True counts never leave the
    * plan. */
  def dpCountRelease(df: DataFrame, groupCol: String, epsilon: Double,
      salt: String = "dp", roundTo: Int = 4): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val u = conv(substring(md5(concat(lit(salt), lit("|"),
      col(groupCol).cast("string"))), 1, 7), 16, 10)
      .cast("double") / lit(268435456.0)
    val centered = col("__u") - lit(0.5)
    // clamp |u−½| off exactly ½ so ln(1−2|·|) can't hit −∞ (a 28-bit
    // u CAN be exactly 0)
    val mag = least(abs(centered), lit(0.49999999))
    val noise = lit(-1.0 / epsilon) * signum(centered) *
      log(lit(1.0) - lit(2.0) * mag)
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__u", u)
      .select(col(groupCol), lit(epsilon).as("epsilon"),
        round(col("__n") + noise, roundTo).as("noisy_n"))
  }

  /** Per-group z-score: (v − μ_g) / σ_g, population σ. Groups with
    * zero variance (σ = 0) yield null — the column carries no signal
    * there, and silently emitting 0 would hide that. One exchange on
    * the group key serves both window aggregates and the projection. */
  def zscore(df: DataFrame, groupCol: String, valueCol: String,
      outCol: String = "z"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
    val v = col(valueCol).cast("double")
    val sigma = stddev_pop(v).over(w)
    df.withColumn(outCol,
      when(sigma =!= 0.0, (v - avg(v).over(w)) / sigma))
  }

  /** Per-group winsorization: clip values into the exact
    * [p(loP), p(hiP)] band of their group. Exact percentiles come from
    * the spillable window-rank path (`Scale.exactPercentiles`) with
    * `quantile_cont` interpolation, so the clip bounds are
    * engine-portable; rows sitting exactly on a bound are unchanged by
    * construction (clipping to your own value is the identity). */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      loP: Double, hiP: Double,
      outCol: String = "clipped"): DataFrame = {
    require(0.0 <= loP && loP < hiP && hiP <= 1.0,
      s"need 0 <= loP < hiP <= 1, got ($loP, $hiP)")
    val bounds = graft.plans.Scale.exactPercentiles(df, groupCol, valueCol,
      Seq("__lo" -> loP, "__hi" -> hiP))
    val v = col(valueCol).cast("double")
    df.join(bounds, Seq(groupCol))
      .withColumn(outCol, least(greatest(v, col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Equal-frequency discretization: bin a numeric column into
    * `nBins` quantile buckets with EXACT interpolated boundaries —
    * the feature-engineering binning that `ntile` only approximates
    * (ntile's cut points depend on row order among ties; boundary
    * binning depends only on values). Boundaries come from the
    * scan-shaped exact-quantile path (`Scale.exactGlobalQuantiles` —
    * no global sort, see its scaladoc) and are ROUNDED to `roundTo`
    * before comparison so an oracle replaying `quantile_cont` bins
    * ties identically. A row lands in bin b = #(boundaries ≤ v),
    * b ∈ [0, nBins−1]; null values get bin null.
    *
    * Scale: the boundary row is a 1-row broadcast; binning is a pure
    * projection over the scan — the discretized column costs nothing
    * beyond the quantile probe jobs. */
  /** Robust per-group outlier flagging by MEDIAN absolute deviation —
    * the outlier detector that survives its own outliers (a z-score's
    * mean and σ are dragged by the very points being hunted; the
    * median and MAD have a 50% breakdown point — Hampel's rule). A
    * row is an outlier when |v − median| > `cut` · MAD; MAD = 0
    * groups (constant-valued) flag nothing, and NULL values pass
    * through unflagged.
    *
    * Scale: two exact-median jobs on the windowed-rank path
    * (`Scale.exactPercentiles` — per-group sort bounded by group size)
    * with the per-group scalars joined back null-safely; the flag
    * itself is a pure projection. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      cut: Double = 3.5, outCol: String = "is_outlier",
      roundTo: Int = 6): DataFrame = {
    require(Seq("__med", "__dev", "__mad").forall(!df.columns.contains(_)),
      "columns __med/__dev/__mad are reserved")
    val v = col(valueCol).cast("double")
    val med = graft.plans.Scale.exactPercentiles(df, groupCol, valueCol,
      Seq("__med" -> 0.5)).withColumnRenamed(groupCol, "__g1")
    val withMed = df.join(broadcast(med), col(groupCol) <=> col("__g1"))
      .drop("__g1")
      .withColumn("__dev", abs(v - col("__med")))
    val mad = graft.plans.Scale.exactPercentiles(withMed, groupCol,
      "__dev", Seq("__mad" -> 0.5)).withColumnRenamed(groupCol, "__g2")
    withMed.join(broadcast(mad), col(groupCol) <=> col("__g2"))
      .drop("__g2")
      .withColumn(outCol, when(v.isNotNull,
        col("__dev") > lit(cut) * col("__mad")))
      .withColumn("median", round(col("__med"), roundTo))
      .withColumn("mad", round(col("__mad"), roundTo))
      .drop("__med", "__dev", "__mad")
  }

  def quantileBins(df: DataFrame, valueCol: String, nBins: Int,
      binCol: String = "bin", roundTo: Int = 6): DataFrame = {
    require(nBins >= 2, s"need nBins >= 2, got $nBins")
    val ps = (1 until nBins).map(i => s"__q$i" -> i.toDouble / nBins)
    val bounds = graft.plans.Scale.exactGlobalQuantiles(df, valueCol, ps)
    val v = col(valueCol).cast("double")
    val bin = ps.map { case (name, _) =>
      when(v >= round(col(name), roundTo), 1).otherwise(0) }
      .reduce(_ + _)
    df.crossJoin(broadcast(bounds))
      .withColumn(binCol, when(v.isNotNull, bin))
      .drop(ps.map(_._1): _*)
  }

  /** Cumulative Poisson(λ=1) CDF at k = 0..8 as shared literals —
    * both engines compare the SAME doubles, so weight assignment is
    * bit-identical across Spark and the oracle. P(X>8) ≈ 1.1e-6. */
  private[curation] val poisson1Cdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253, 0.9999988885102237)

  /** Poisson-bootstrap confidence intervals — the ONLY bootstrap that
    * works at lake scale. Classic resampling draws n rows with
    * replacement per replicate: n·R row movements and a shuffle per
    * replicate. The Poisson trick (Chamandy et al., Google 2012):
    * each row independently carries a Poisson(1) count PER replicate
    * (for large n, multinomial resampling ≈ independent Poisson), so
    * ALL R replicates compute in one scan — explode R weight slots
    * per row straight into a partial+final (group, rep) aggregate;
    * nothing is ever materialized at n·R, no row is resampled across
    * the cluster.
    *
    * Weights are DETERMINISTIC: the portable md5 bridge hashes
    * (salt, row key, replicate BLOCK) and slices the 32-hex digest
    * into FOUR independent 28-bit uniforms — one per replicate in the
    * block — each inverted through [[poisson1Cdf]]. Any engine, any
    * retry, any cluster assigns the same weight, which is what lets a
    * bootstrap (of all things) be hash-judged against an oracle; the
    * 4-way slicing matters because the md5-of-concat is the hot
    * expression (R·n of them dominated the wall clock measured at
    * sf0.1) and one digest legitimately carries 112 of its 128 bits
    * as four disjoint uniforms.
    *
    * Output per group: `n`, the point-estimate `mean`, and the
    * [lo, hi] percentile CI of the R replicate weighted means —
    * replicate means are exact-percentiled per group (R values each,
    * R-bounded, `percentile`'s linear interpolation = DuckDB
    * `quantile_cont`). */
  def poissonBootstrapCI(df: DataFrame, groupCol: String, keyCol: String,
      valueCol: String, reps: Int = 100, lo: Double = 0.025,
      hi: Double = 0.975, salt: String = "boot",
      roundTo: Int = 4): DataFrame = {
    require(reps >= 2, s"need reps >= 2, got $reps")
    val v = col(valueCol).cast("double")
    val w = poisson1Cdf.zipWithIndex.foldRight(lit(9): Column) {
      case ((t, k), acc) => when(col("__u") < t, lit(k)).otherwise(acc)
    }
    // Repartition BEFORE the explode: the replicate fan-out multiplies
    // per-row work by R (hash + weight per replicate), so input
    // parallelism — not input size — bounds the wall clock. A compact
    // lake table can arrive as one file = one partition, serializing
    // R·n hashes onto a single core; redistributing the n input rows
    // (cheap, pre-explosion) lets every core take an equal slice. Hash
    // weights are content-keyed, so placement never changes results.
    // The partition count is EXPLICIT: a bare repartition(col) lets
    // AQE coalesce by pre-explosion byte size — a few MB of keys would
    // re-serialize onto one or two cores, defeating the spread, because
    // AQE can't see that each row is about to fan out R-fold.
    val spread = df.filter(v.isNotNull)
      .select(col(groupCol), col(keyCol), v.as("__v"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col(keyCol))
    // One md5 per (row, BLOCK of 4 replicates): the digest is 32 hex
    // chars; chars [1,7] [8,14] [15,21] [22,28] are four disjoint
    // 28-bit uniforms, so the expensive expression (string concat +
    // md5) runs R/4 — not R — times per row, and the per-replicate
    // residue is a cheap substring + hex parse. Stages stay NAMED
    // projections: `w` references `u` in ~10 CaseWhen branch
    // conditions, and branch expressions are conditional to codegen —
    // no subexpression elimination — so inlining would re-run the hex
    // parse per branch; as columns each computes once, and the double
    // use in the aggregate keeps CollapseProject from folding the
    // non-cheap parse back in.
    val blocks = (reps + 3) / 4
    val repMeans = spread
      .select(col(groupCol), col(keyCol), col("__v"),
        explode(sequence(lit(0), lit(blocks - 1))).as("__blk"))
      .withColumn("__h", md5(concat(lit(salt), lit("|"),
        col(keyCol).cast("string"), lit("|"), col("__blk"))))
      .select(col(groupCol), col("__v"), col("__blk"),
        posexplode(array((0 until 4).map(i =>
          substring(col("__h"), 1 + 7 * i, 7)): _*)).as(Seq("__slc", "__hx")))
      .withColumn("__rep", col("__blk") * 4 + col("__slc"))
      .filter(col("__rep") < reps) // reps not divisible by 4: drop tail
      .withColumn("__u", conv(col("__hx"), 16, 10).cast("double") /
        lit(268435456.0))
      .withColumn("__w", w)
      .groupBy(col(groupCol), col("__rep"))
      .agg((sum(col("__v") * col("__w")) / sum(col("__w"))).as("__m"))
    val base = df.filter(v.isNotNull).groupBy(col(groupCol))
      .agg(count(v).as("n"), round(avg(v), roundTo).as("mean"))
    val ci = repMeans.groupBy(col(groupCol))
      .agg(percentile(col("__m"), lit(lo)).as("__lo"),
        percentile(col("__m"), lit(hi)).as("__hi"))
    base.join(ci, Seq(groupCol))
      .select(col(groupCol), col("n"), col("mean"),
        round(col("__lo"), roundTo).as("ci_lo"),
        round(col("__hi"), roundTo).as("ci_hi"))
  }
}
