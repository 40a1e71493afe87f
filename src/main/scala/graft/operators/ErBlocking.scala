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
    a.join(b, Seq("block")).filter(cond)
      .withColumn("n_cross",
        when(col("a_name") === col("b_name"),
          col("a_cnt") * (col("a_cnt") - 1) / 2)
          .otherwise(col("a_cnt") * col("b_cnt")).cast("long"))
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
