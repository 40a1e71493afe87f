package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity-resolution blocking on the DISTINCT-NAME grain — the scale
  * fix for blocked fuzzy linkage (`j19_fuzzy_blocked`,
  * `j30_jw_linkage`; reference behavior: string-similarity matching of
  * `data_transformers.py`-cleaned identity fields).
  *
  * The hazard this removes: blocking row pairs on a low-cardinality
  * key (first name token, ~8 values in this lake) makes within-block
  * pair counts grow QUADRATICALLY with the data — ~25M string-kernel
  * evaluations at sf0.1 become ~250G at 100×. But the kernel score
  * depends only on the NAME STRINGS, not on which rows carry them, so
  * the linkage factors exactly:
  *
  *   1. roll the corpus up to distinct (block, name) CLASSES, keeping
  *      per class its row count, max key, and the (k+1) smallest keys;
  *   2. score string kernels on CLASS pairs only — |names|² work,
  *      independent of row count (288 evaluations here, any SF);
  *   3. expand row-level answers arithmetically: pair counts multiply
  *      (cnt_a·cnt_b cross pairs, C(cnt,2) within a class), and the
  *      judged top-k row pairs materialize from the kept smallest keys
  *      — provably sufficient, see [[lowKeysSuffice]].
  *
  * Row-level results are BIT-IDENTICAL to the naive row-pair join (the
  * DuckDB oracles for both judged queries are unchanged), while the
  * quadratic term moves from row count to distinct-name count — which
  * [[requireBoundedBlocks]] turns into an ENFORCED contract instead of
  * a code-comment hope: blocks with more distinct names than the cap
  * fail loudly, naming the offenders, telling the pipeline author to
  * strengthen the blocking key (composite key, LSH banding over name
  * shingles — `dedup/Dedup.minhashLshPairs` — or upstream
  * normalization) instead of silently burning a cluster.
  *
  * [[lowKeysSuffice]]: for any class pair, every one of its top-k row
  * pairs under (score, a_key asc, b_key asc) ordering — a_key the
  * SMALLER key of the pair — uses only keys among the (k+1) smallest
  * of each class. Proof: suppose pair p = (i, j) where i is NOT among
  * the (k+1) smallest of its class. Then k+1 keys i' < i exist in that
  * class; pairing each with any fixed partner key j₀ of the other
  * class (or of the same class) yields a pair whose smaller key is
  * ≤ i' < i, i.e. k+1 pairs that sort strictly before p — so p is not
  * in the top k. Symmetrically for j. ∎
  */
object ErBlocking {

  /** Distinct-name classes of `df` under a blocking key:
    * `(block, name, cnt, max_key, low_keys)` with `low_keys` the
    * sorted `keepSmallest` smallest keys of the class.
    *
    * Shape at scale: one hash aggregate on (block, name) for
    * cnt/max_key, and the in-house [[org.apache.spark.sql.graftx
    * .TopKPerGroup]] physical operator for the smallest keys — its
    * partial pass ships ≤ `keepSmallest` rows per class per map
    * partition, so a name duplicated across a million rows never
    * funnels them through one sort (the window row_number form would).
    */
  def nameClasses(df: DataFrame, blockCol: Column, nameCol: Column,
      keyCol: Column, keepSmallest: Int): DataFrame = {
    require(keepSmallest >= 1, s"keepSmallest must be >= 1: $keepSmallest")
    val base = df.select(blockCol.as("block"), nameCol.as("name"),
      keyCol.as("key"))
    val stats = base.groupBy(col("block"), col("name"))
      .agg(count(lit(1)).as("cnt"), max(col("key")).as("max_key"))
    val low = org.apache.spark.sql.graftx.TopKPerGroup(
        base, Seq(col("block"), col("name")), Seq(col("key")), keepSmallest)
      .groupBy(col("block"), col("name"))
      .agg(sort_array(collect_list(col("key"))).as("low_keys"))
    stats.join(low, Seq("block", "name"))
  }

  /** Enforce the bounded-block contract: no block may hold more than
    * `maxNamesPerBlock` distinct names. Throws with the worst
    * offenders named — loud by design: an oversized block means the
    * blocking key stopped discriminating and the class self-join would
    * quietly go quadratic, the exact failure mode this operator
    * exists to prevent. */
  def requireBoundedBlocks(classes: DataFrame, maxNamesPerBlock: Long,
      context: String): Unit = {
    require(maxNamesPerBlock >= 1, "maxNamesPerBlock must be >= 1")
    val offenders = classes.groupBy(col("block"))
      .agg(count(lit(1)).as("n_names"))
      .filter(col("n_names") > maxNamesPerBlock)
      .orderBy(desc("n_names"))
      .limit(5)
      .collect()
    if (offenders.nonEmpty) {
      val worst = offenders.map(r => s"${r.get(0)}=${r.get(1)}")
        .mkString(", ")
      throw new IllegalStateException(
        s"[graft.ErBlocking] $context: blocking key produced blocks with " +
          s"more than $maxNamesPerBlock distinct names ($worst). " +
          "Within-block work is quadratic in distinct names — strengthen " +
          "the blocking key (composite key, LSH banding over name " +
          "shingles: dedup.Dedup.minhashLshPairs) before re-running.")
    }
  }

  /** Scored class self-join: one row per unordered class pair within a
    * block (including each class paired with itself when `cnt >= 2`,
    * unless `strict`), carrying `a_*`/`b_*` class columns with
    * `a.name <= b.name`. Callers filter on their kernel score and
    * expand. `n_cross` pre-computes the row-pair multiplicity:
    * C(cnt, 2) within a class, cnt_a·cnt_b across classes. */
  def classPairs(classes: DataFrame, strict: Boolean): DataFrame = {
    val a = classes.select(col("block"), col("name").as("a_name"),
      col("cnt").as("a_cnt"), col("max_key").as("a_max_key"),
      col("low_keys").as("a_low_keys"))
    val b = classes.select(col("block"), col("name").as("b_name"),
      col("cnt").as("b_cnt"), col("max_key").as("b_max_key"),
      col("low_keys").as("b_low_keys"))
    val cond =
      if (strict) col("a_name") < col("b_name")
      else col("a_name") <= col("b_name") &&
        (col("a_name") < col("b_name") || col("a_cnt") >= 2)
    // pure LONG arithmetic: Spark's `/ 2` is double division and the
    // when/otherwise would coerce both branches to double, silently
    // losing precision above 2^53 — exactly the multiplicity regime a
    // heavily-duplicated name reaches at scale. cnt·(cnt−1) is always
    // even, so an arithmetic right-shift is the exact halving.
    a.join(b, Seq("block")).filter(cond)
      .withColumn("n_cross",
        when(col("a_name") === col("b_name"),
          shiftright(col("a_cnt") * (col("a_cnt") - lit(1L)), 1))
          .otherwise(col("a_cnt") * col("b_cnt")))
  }

  /** PassJoin segment blocking (Li, Deng & Feng 2011, "PassJoin: a
    * partition-based method for similarity joins") — the EXACT
    * edit-distance self-join for the regime [[nameClasses]] can't fix:
    * a corpus whose names are mostly UNIQUE (distinct-name grain ≈ row
    * grain, so class pairs under any low-cardinality blocking key go
    * quadratic again). Pigeonhole: partition every string into τ+1
    * segments; τ edits can destroy at most τ of them, so any pair
    * within edit distance τ shares at least one segment VERBATIM at a
    * compatible position. The blocking key becomes
    * (target length, segment index, segment text) — high-cardinality
    * by construction (substrings), with bucket sizes bounded by how
    * many strings share an exact substring, not by a vocabulary.
    *
    * Probe generation uses the sound ±τ position window (a superset of
    * the paper's multi-match-aware window — more candidates, same
    * exact recall): for each target length within ±τ of its own and
    * each segment slot, a string emits every substring of that slot's
    * length starting within τ of the slot's position. Fan-out per
    * string is a CONSTANT (≤ (2τ+1)²·(τ+1) rows, ~200 at τ=3) — the
    * shuffle grows linearly with rows while candidate pairs stay
    * bounded by true near-duplicate density.
    *
    * Returns DISTINCT name pairs `(a_name, b_name, dist)` with
    * `a_name < b_name` and `dist = levenshtein ≤ tau` — the value
    * grain; expand to record pairs with [[nameClasses]] counts.
    * Contract: every name must be at least τ+1 characters (shorter
    * strings make zero-length segments, which match everywhere);
    * enforced with one aggregate, loudly. `maxBucket` guards the one
    * residual skew surface — a substring shared by very many strings
    * (e.g. a constant prefix) — by failing with the offending
    * (length, slot, segment) buckets named, same philosophy as
    * [[requireBoundedBlocks]]. */
  def editSegmentPairs(names: DataFrame, nameCol: String, tau: Int,
      maxBucket: Long = 100000L): DataFrame = {
    require(tau >= 1, s"tau must be >= 1: $tau")
    require(maxBucket >= 1, "maxBucket must be >= 1")
    val k = tau + 1
    val n = names.select(col(nameCol).as("name")).distinct()
      .filter(col("name").isNotNull)
    // segment slot i of a length-l string: first (k - l%k) slots get
    // floor(l/k) chars, the rest one more. CLOSED FORMS over a runtime
    // slot column (so both sides generate their rows from ONE scan +
    // explode, not a k- or 196-way union of scans):
    //   len(l,i)   = ⌊l/k⌋ + [i ≥ k − l%k]
    //   start(l,i) = 1 + i·⌊l/k⌋ + max(0, i − (k − l%k))   (1-based)
    def segLen(l: Column, i: Column): Column = {
      val base = floor(l / k).cast("int")
      val rem = (l % k).cast("int")
      base + when(i >= lit(k) - rem, 1).otherwise(0)
    }
    def segStart(l: Column, i: Column): Column = {
      val base = floor(l / k).cast("int")
      val rem = (l % k).cast("int")
      lit(1) + i * base + greatest(lit(0), i - (lit(k) - rem))
    }
    // the distinct-name frame feeds four consumers (min-length check,
    // bucket guard, segments, probes) — materialize the distinct ONCE
    // (ContextCleaner-freed with the plan, per the repo-wide policy)
    val idx = n.select(col("name"), length(col("name")).as("l"))
      .transform(graft.plans.Pin.pin)
    val minLen = idx.agg(min(col("l"))).collect()(0)
    if (!minLen.isNullAt(0) && minLen.getInt(0) < k)
      throw new IllegalStateException(
        s"[graft.ErBlocking] editSegmentPairs(tau=$tau): names shorter " +
          s"than $k chars present (min ${minLen.getInt(0)}) — " +
          "zero-length segments match everywhere; route short strings " +
          "through a dedicated small block instead.")
    // index side: one row per (name, slot), single scan + explode
    val slots = array((0 until k).map(lit): _*)
    val segs = idx
      .select(col("name"), col("l"), explode(slots).as("slot"))
      .select(col("name").as("b_name"), col("l").as("len"), col("slot"),
        col("name").substr(segStart(col("l"), col("slot")),
          segLen(col("l"), col("slot"))).as("seg"))
    // skew guard on the segment buckets before any join
    val offenders = segs.groupBy(col("len"), col("slot"), col("seg"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket)
      .orderBy(desc("n")).limit(5).collect()
    if (offenders.nonEmpty)
      throw new IllegalStateException(
        s"[graft.ErBlocking] editSegmentPairs: segment buckets exceed " +
          s"$maxBucket strings (" +
          offenders.map(r => s"(${r.get(0)},${r.get(1)},${r.get(2)})=" +
            s"${r.get(3)}").mkString(", ") +
          ") — a near-constant substring defeats segment blocking; " +
          "raise tau granularity or pre-strip the shared affix.")
    // probe side: for each target length within ±tau and each slot,
    // substrings of the slot's length starting within ±tau of the
    // slot's position (sound superset of the multi-match-aware
    // window). One scan + one explode of the constant (dl, slot, off)
    // parameter grid — NOT a (2τ+1)²(τ+1)-way union, which would
    // compile that many scans of the corpus.
    val grid = array((for {
      dl <- -tau to tau
      i <- 0 until k
      off <- -tau to tau
    } yield struct(lit(dl).as("dl"), lit(i).as("slot"),
      lit(off).as("off"))): _*)
    val probes = idx
      .select(col("name"), col("l"), explode(grid).as("g"))
      .select(col("name"), col("l"),
        (col("l") + col("g.dl")).as("tl"), col("g.slot").as("slot"),
        col("g.off").as("off"))
      .withColumn("st", segStart(col("tl"), col("slot")) + col("off"))
      .withColumn("ln", segLen(col("tl"), col("slot")))
      .filter(col("tl") >= k && col("st") >= 1
        && col("st") + col("ln") - 1 <= col("l"))
      .select(col("name").as("a_name"), col("tl").cast("int").as("len"),
        col("slot"),
        col("name").substr(col("st"), col("ln")).as("seg"))
    val cands = probes.join(segs, Seq("len", "slot", "seg"))
      .filter(col("a_name") < col("b_name"))
      .select(col("a_name"), col("b_name"))
      .distinct()
    val d = levenshtein(col("a_name"), col("b_name"), tau)
    cands.withColumn("dist", d.cast("long"))
      .filter(col("dist").between(0, tau))
  }

  /** Materialize candidate row pairs for a top-k-per-block judgment
    * from scored class pairs: the cross product of the kept smallest
    * keys (≤ (k+1)² rows per class pair), oriented (smaller, larger).
    * By [[lowKeysSuffice]] the true top-k row pairs per block under
    * (score desc, a_key, b_key) are all present. Input must carry
    * `a_low_keys`/`b_low_keys` and the score column. */
  def candidateRowPairs(scored: DataFrame, scoreCol: String): DataFrame =
    scored
      .select(col("block"), col(scoreCol),
        (col("a_name") === col("b_name")).as("__same"),
        explode(col("a_low_keys")).as("__ka"), col("b_low_keys"))
      .select(col("block"), col(scoreCol), col("__same"), col("__ka"),
        explode(col("b_low_keys")).as("__kb"))
      // same-class arrays are identical: keep each unordered pair once,
      // drop self-pairs; cross-class combos are unique already
      .filter(!col("__same") || col("__ka") < col("__kb"))
      .select(col("block"),
        least(col("__ka"), col("__kb")).as("a_key"),
        greatest(col("__ka"), col("__kb")).as("b_key"),
        col(scoreCol))
}
