package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup

/** Deduplication operators (training-data pipeline extensions): exact,
  * n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine — exact and
  * Jaccard paths verified in ANSI SQL; the hash-sketch paths (xxhash64
  * has no DuckDB equivalent) ship deterministic rows-only queries pinned
  * by TextDedupSpec on planted duplicates. */
object DedupQueries extends QuerySection {
  import Catalog.Q

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Exact-dup statistics (hash groupBy). */
  private def dedupExactStats(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDupStats(docs(s, dir), "text")

  /** Exact dedup survivors: deterministic keep-min-id per content hash. */
  private def dedupExactSurvivors(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(docs(s, dir), "text", "doc_id")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id")).limit(200)

  /** Token-set (1-gram) Jaccard near-dup pairs over a bounded id range. */
  private def dedupNgram(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(
      docs(s, dir).filter(col("doc_id") < 100), "text", "doc_id",
      n = 1, threshold = 0.8, maxShingleFreq = 1000000L)
      .orderBy(col("id_a"), col("id_b"))

  /** Asymmetric containment pairs ([[Dedup.containmentPairs]], τ=0.9):
    * the quote-inclusion shape Jaccard misses — the judged rows carry
    * both scores, so pairs with containment ≥ 0.9 but low Jaccard are
    * visible evidence of the asymmetric detector earning its keep. */
  private def dedupContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(
      docs(s, dir).filter(col("doc_id") < 300), "text", "doc_id",
      n = 1, threshold = 0.9, maxShingleFreq = 1000000L)
      .orderBy(col("id_a"), col("id_b"))

  /** Prefix-filtered set-similarity JOIN (`operators/SetSimJoin.scala`)
    * — cross-corpus Jaccard ≥ τ pairs (even doc_ids vs odd, the
    * query-vs-corpus contamination shape) via PPJoin candidate
    * generation instead of the all-pairs product. The oracle is the
    * NAIVE all-pairs join: prefix filtering is candidate-complete, so
    * the two must agree row for row — the judged query proves the
    * pruning lossless, SetSimJoinSpec proves it against a Spark cross
    * join and that prefixes genuinely shrink. */
  private def ssjoinPrefix(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextAnalysis.tokens
    val d = docs(s, dir).filter(col("doc_id") < 300)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    graft.operators.SetSimJoin.jaccardJoin(
      d.filter(col("doc_id") % 2 === 0),
      d.filter(col("doc_id") % 2 === 1),
      "doc_id", "toks", tau = 0.95)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** MinHash+LSH near-dup pairs — the full sketch pipeline (seeded
    * min-hashes → banding → bucket join → exact-Jaccard verify) is
    * oracle-checked: the portable md5-bridge hash computes identically
    * in DuckDB, so signatures, band buckets, candidates and verified
    * pairs all hash-compare. Bands of 4 rows: collision probability s⁴
    * per band keeps low-similarity candidates out of the bucket join on
    * this high-overlap corpus. */
  private def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(
      docs(s, dir).filter(col("doc_id") < 200), "text", "doc_id",
      n = 1, numHashes = 32, bands = 8, verifyThreshold = 0.8,
      portableHash = true)
      .orderBy(col("id_a"), col("id_b"))

  /** INCREMENTAL MinHash dedup — the daily-increment shape: the
    * "historical corpus" (doc_id % 5 ≠ 0) is sketched ONCE into a
    * persisted index (band buckets + token sets), then the "new batch"
    * (doc_id % 5 = 0) is checked against the stored index without
    * touching corpus text. Same portable sketch as dedup_minhash, so
    * the oracle replays signatures for both sides and restricts the
    * bucket join to corpus × new. */
  private def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).filter(col("doc_id") < 200)
    val corpus = d.filter(col("doc_id") % 5 =!= 0)
    val fresh = d.filter(col("doc_id") % 5 === 0)
    val idx = graft.etl.Utils.tempDir("graft_mhidx")
      .toString
    Dedup.buildMinhashIndex(corpus, "text", "doc_id", idx,
      n = 1, numHashes = 32, bands = 8, portableHash = true)
    Dedup.incrementalDupes(s, fresh, "text", "doc_id", idx,
      n = 1, numHashes = 32, bands = 8, verifyThreshold = 0.8,
      portableHash = true)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Index TAKEDOWN judged end-to-end
    * ([[Dedup.deleteFromMinhashIndex]] → [[Dedup.compactMinhashIndex]]
    * as the vacuum): the corpus index is built, every doc_id % 3 == 0
    * is tombstoned, compaction physically purges them (bytes gone,
    * tombstones consumed), and the daily increment probe afterwards
    * must behave as if the deleted docs were never indexed — judged
    * against the blind sketch replay with the deleted slice excluded
    * from the history side of the pair condition. */
  private def dedupIndexDelete(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).filter(col("doc_id") < 200)
    val corpus = d.filter(col("doc_id") % 5 =!= 0)
    val fresh = d.filter(col("doc_id") % 5 === 0)
    val idx = graft.etl.Utils.tempDir("graft_mhdel")
      .toString
    Dedup.buildMinhashIndex(corpus, "text", "doc_id", idx,
      n = 1, numHashes = 32, bands = 8, portableHash = true)
    Dedup.deleteFromMinhashIndex(
      d.filter(col("doc_id") % 3 === 0).select(col("doc_id")),
      "doc_id", idx)
    Dedup.compactMinhashIndex(s, idx)
    Dedup.incrementalDupes(s, fresh, "text", "doc_id", idx,
      n = 1, numHashes = 32, bands = 8, verifyThreshold = 0.8,
      portableHash = true)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SimHash near-dup pairs — portable 60-bit variant so the whole
    * sketch (per-bit votes, fingerprint reassembly, 15-bit quadrant
    * buckets, Hamming verify) is oracle-checked in SQL. maxHamming = 3
    * is the radius the 4-quadrant pigeonhole actually GUARANTEES
    * candidates for (any pair within Hamming 3 shares an identical
    * quadrant); a larger radius would only surface pairs that happen to
    * collide on a quadrant — best-effort recall dressed up as a bound. */
  private def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(
      docs(s, dir).filter(col("doc_id") < 300), "text", "doc_id",
      maxHamming = 3, portableHash = true)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
      .orderBy(col("id_a"), col("id_b"))

  /** Embedding-cosine near-dup pairs over a bounded id range. */
  private def dedupEmbedding(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDups(
      Tables.load(s, dir, "embeddings").filter(col("vec_id") < 300),
      "embedding", "vec_id", threshold = 0.35)
      .orderBy(col("id_a"), col("id_b"))

  /** End-to-end corpus cleaning (the flagship training-data composite):
    * exact dedup (keep-min-id per content hash) → near-dup pair
    * detection (2-gram Jaccard ≥ 0.6) → greedy removal (any doc that is
    * the larger id of a pair drops; the smallest id in each near-dup
    * cluster survives). The whole chain hash-compares against the same
    * logic in ANSI SQL. */
  private def dedupPipeline(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).filter(col("doc_id") < 500)
    val exact = Dedup.exactDedup(d, "text", "doc_id")
    val losers = Dedup.ngramJaccardPairs(exact, "text", "doc_id",
        n = 2, threshold = 0.6, maxShingleFreq = 1000000L)
      .select(col("id_b").as("doc_id")).distinct()
    exact.join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Near-dup CLUSTER formation (graft.dedup.Cluster): 2-gram Jaccard
    * pairs → distributed min-label connected components → (doc, cluster
    * id). Transitively-linked docs (A~B, B~C) land in one cluster even
    * though A and C were never compared — the step that turns pair
    * detection into corpus dedup. Oracle: DuckDB recursive-CTE
    * transitive closure over the same pair graph. */
  private def dedupCluster(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).filter(col("doc_id") < 500)
    val pairs = Dedup.ngramJaccardPairs(d, "text", "doc_id",
      n = 2, threshold = 0.6, maxShingleFreq = 1000000L)
    graft.dedup.Cluster.connectedComponents(pairs, "id_a", "id_b")
      .select(col("node").as("doc_id"), col("comp"))
      .orderBy(col("doc_id"))
  }

  /** Cluster-aware corpus collapse: the transitive closure of the pair
    * graph picks ONE survivor per near-dup cluster (min doc_id) and
    * keeps every never-paired doc — stricter than dedup_pipeline's
    * greedy pair removal, which can drop a whole cluster when its
    * members chain (A<B<C with only A~B, B~C pairs: greedy drops B and
    * C; cluster collapse keeps A). */
  private def dedupClusterSurvivors(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).filter(col("doc_id") < 500)
    val pairs = Dedup.ngramJaccardPairs(d, "text", "doc_id",
      n = 2, threshold = 0.6, maxShingleFreq = 1000000L)
    val comps = graft.dedup.Cluster.connectedComponents(pairs, "id_a", "id_b")
    graft.dedup.Cluster.survivors(d, "doc_id", comps)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** SemDeDup-style semantic dedup ([[graft.dedup.SemDedup]], Abbas et
    * al. 2023): 8 deterministic seed centroids (vec_id < 8), argmax-
    * cosine cluster assignment as one codegen projection, then a W=8
    * windowed near-dup scan in centroid-proximity order inside each
    * cluster — per-row verdicts judged (cluster, rank, centroid cosine,
    * dup flag), the keeper of every dup pair being the item nearer its
    * centroid. The semantic grain the lexical dedups (minhash/simhash/
    * ngram) cannot see; candidate count Θ(n·W), never all-pairs. */
  private def dedupSemantic(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding"))
    graft.dedup.SemDedup.semanticDedup(e, "embedding", "vec_id",
        cents, window = 8, threshold = 0.35)
      .orderBy(col("cluster"), col("vec_id"))
  }

  /** Index LIFECYCLE end-to-end (build → append → COMPACT → query):
    * the corpus index takes an increment via
    * [[Dedup.appendToMinhashIndex]], is rewritten band-clustered by
    * [[Dedup.compactMinhashIndex]] (the maintenance op that keeps
    * months of daily appends scannable), and then answers a SECOND
    * increment's near-dup probe — judged against the blind one-shot
    * sketch replay, so a compaction that loses/duplicates/reorders any
    * sketch row breaks CORRECTNESS, not just a spec. */
  private def dedupIndexCompact(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).filter(col("doc_id") < 200)
    val corpus = d.filter(col("doc_id") % 5 =!= 0)
    val f1 = d.filter(col("doc_id") % 5 === 0 && col("doc_id") < 100)
    val f2 = d.filter(col("doc_id") % 5 === 0 && col("doc_id") >= 100)
    val idx = graft.etl.Utils.tempDir("graft_mhcmp")
      .toString
    Dedup.buildMinhashIndex(corpus, "text", "doc_id", idx,
      n = 1, numHashes = 32, bands = 8, portableHash = true)
    Dedup.appendToMinhashIndex(f1, "text", "doc_id", idx,
      n = 1, numHashes = 32, bands = 8, portableHash = true)
    Dedup.compactMinhashIndex(s, idx, files = 4)
    Dedup.incrementalDupes(s, f2, "text", "doc_id", idx,
      n = 1, numHashes = 32, bands = 8, verifyThreshold = 0.8,
      portableHash = true)
      .orderBy(col("id_a"), col("id_b"))
  }

  def queries: Map[String, Q] = Map(
    "dedup_index_compact" -> (dedupIndexCompact _),
    "dedup_semantic" -> (dedupSemantic _),
    "dedup_cluster" -> (dedupCluster _),
    "dedup_cluster_survivors" -> (dedupClusterSurvivors _),
    "dedup_pipeline" -> (dedupPipeline _),
    "dedup_exact_stats" -> (dedupExactStats _),
    "dedup_exact_survivors" -> (dedupExactSurvivors _),
    "dedup_ngram" -> (dedupNgram _),
    "dedup_containment" -> (dedupContainment _),
    "ssjoin_prefix" -> (ssjoinPrefix _),
    "dedup_minhash" -> (dedupMinhash _),
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_index_delete" -> (dedupIndexDelete _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_embedding" -> (dedupEmbedding _)
  )

  /** DuckDB replica of the portable minhash sketch (32 min-hashes from
    * the 2-universal family h1 + s·h2 over two 28-bit md5-bridge base
    * hashes, 8 bands of 4, bucket join, Jaccard ≥ 0.8 verify). */
  private def minhashOracle: String =
    minhashOracleWith("a.doc_id < b.doc_id")

  /** Same sketch replay with the bucket join restricted to corpus ×
    * new-batch pairs — signatures are per-doc independent, so the
    * stored-index form and the all-at-once form agree slice for
    * slice. */
  private def incrementalMinhashOracle: String =
    minhashOracleWith("a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0")

  /** `private[queries]`: StreamingQueries reuses this replica for
    * `stream_near_dedup` (history×new ∪ ordered new×new condition). */
  private[queries] def minhashOracleWith(candCondition: String): String = {
    def mdInt(e: String) = s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"
    def mdInt7(e: String) = s"CAST('0x' || substr(md5($e), 1, 7) AS BIGINT)"
    val mins = (0 until 32)
      .map(s => s"    min(h1 + $s * h2) AS m$s")
      .mkString(",\n")
    val buckets = (0 until 8).map { b =>
      val key = (b * 4 until b * 4 + 4).map(i => s"m$i")
        .mkString("concat(", ", ',', ", ")")
      s"  SELECT doc_id, $b AS band, ${mdInt(key)} AS h FROM sig"
    }.mkString("\n  UNION ALL\n")
    s"""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
       |tok AS (SELECT doc_id, unnest(string_split_regex(trim(text),
       |  '\\s+')) AS t FROM d),
       |h AS (SELECT doc_id, ${mdInt7("'1|' || t")} AS h1,
       |  ${mdInt7("'2|' || t")} AS h2 FROM tok),
       |sig AS (SELECT doc_id,
       |$mins
       |  FROM h GROUP BY doc_id),
       |buckets AS (
       |$buckets),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM buckets a JOIN buckets b
       |    ON a.band = b.band AND a.h = b.h AND $candCondition),
       |ts AS (SELECT doc_id, list_distinct(string_split_regex(
       |  trim(lower(text)), '\\s+')) AS tk FROM d),
       |j AS (SELECT id_a, id_b,
       |    round(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) /
       |      (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))), 6)
       |      AS jaccard
       |  FROM cand JOIN ts a ON a.doc_id = id_a
       |  JOIN ts b ON b.doc_id = id_b)
       |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.8
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** DuckDB replica of the portable 60-bit simhash sketch. */
  private def simhashOracle: String = {
    val votes = (0 until 60)
      .map(i => s"    sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS v$i")
      .mkString(",\n")
    val rebuild = (0 until 60)
      .map(i => s"(CASE WHEN v$i > 0 THEN (CAST(1 AS BIGINT) << $i) ELSE 0 END)")
      .mkString(" +\n    ")
    val quads = (0 until 4)
      .map(q => s"  SELECT doc_id, $q AS q, (sim >> ${q * 15}) & 32767 AS v, sim FROM s")
      .mkString("\n  UNION ALL\n")
    s"""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
       |tok AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)),
       |  '\\s+')) AS t FROM d),
       |h AS (SELECT doc_id,
       |  CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS h FROM tok),
       |v AS (SELECT doc_id,
       |$votes
       |  FROM h GROUP BY doc_id),
       |s AS (SELECT doc_id,
       |    $rebuild AS sim
       |  FROM v),
       |quads AS (
       |$quads),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
       |  FROM quads a JOIN quads b
       |    ON a.q = b.q AND a.v = b.v AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "dedup_cluster" ->
      """WITH RECURSIVE
        |d AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
        |toks AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS tk FROM d),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(tk) >= 2 THEN
        |      list_transform(generate_series(1, len(tk) - 1),
        |        i -> array_to_string(tk[i:i+1], ' '))
        |    ELSE [] END)) AS t
        |  FROM toks),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM sh a JOIN sh b ON a.t = b.t AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |near AS (
        |  SELECT id_a, id_b FROM pairs
        |  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |  WHERE round(CAST(common AS DOUBLE) /
        |    (sa.sz + sb.sz - common), 6) >= 0.6),
        |edges AS (SELECT id_a AS a, id_b AS b FROM near
        |  UNION SELECT id_b, id_a FROM near),
        |reach(n, m) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a)
        |SELECT n AS doc_id, least(min(m), n) AS comp FROM reach GROUP BY n
        |ORDER BY doc_id""".stripMargin,
    "dedup_cluster_survivors" ->
      """WITH RECURSIVE
        |d AS (SELECT doc_id, text, lang FROM documents WHERE doc_id < 500),
        |toks AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS tk FROM d),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(tk) >= 2 THEN
        |      list_transform(generate_series(1, len(tk) - 1),
        |        i -> array_to_string(tk[i:i+1], ' '))
        |    ELSE [] END)) AS t
        |  FROM toks),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM sh a JOIN sh b ON a.t = b.t AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |near AS (
        |  SELECT id_a, id_b FROM pairs
        |  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |  WHERE round(CAST(common AS DOUBLE) /
        |    (sa.sz + sb.sz - common), 6) >= 0.6),
        |edges AS (SELECT id_a AS a, id_b AS b FROM near
        |  UNION SELECT id_b, id_a FROM near),
        |reach(n, m) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a),
        |comp AS (SELECT n AS doc_id, least(min(m), n) AS comp
        |  FROM reach GROUP BY n),
        |losers AS (SELECT doc_id FROM comp WHERE comp < doc_id)
        |SELECT doc_id, lang FROM d
        |WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        |ORDER BY doc_id""".stripMargin,
    "dedup_minhash" -> minhashOracle,
    "dedup_incremental" -> incrementalMinhashOracle,
    // takedown: the deleted slice leaves the HISTORY side of the pair
    // condition; signatures are per-doc independent so the purged
    // index equals the never-indexed corpus
    "dedup_index_delete" -> minhashOracleWith(
      "a.doc_id % 5 <> 0 AND a.doc_id % 3 <> 0 AND b.doc_id % 5 = 0"),
    "dedup_simhash" -> simhashOracle,
    "dedup_pipeline" ->
      """WITH d AS (SELECT * FROM documents WHERE doc_id < 500),
        |exact AS (
        |  SELECT * FROM d QUALIFY row_number() OVER (
        |    PARTITION BY md5(text) ORDER BY doc_id) = 1),
        |toks AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS tk FROM exact),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(tk) >= 2 THEN
        |      list_transform(generate_series(1, len(tk) - 1),
        |        i -> array_to_string(tk[i:i+1], ' '))
        |    ELSE [] END)) AS t
        |  FROM toks),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM sh a JOIN sh b ON a.t = b.t AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |near AS (
        |  SELECT id_a, id_b FROM pairs
        |  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |  WHERE round(CAST(common AS DOUBLE) /
        |    (sa.sz + sb.sz - common), 6) >= 0.6)
        |SELECT doc_id, lang FROM exact
        |WHERE doc_id NOT IN (SELECT id_b FROM near)
        |ORDER BY doc_id""".stripMargin,
    "dedup_exact_stats" ->
      """SELECT n, n_unique, n - n_unique AS n_dups FROM
        |(SELECT count(*) AS n, count(DISTINCT md5(text)) AS n_unique
        | FROM documents)""".stripMargin,
    "dedup_exact_survivors" ->
      """SELECT doc_id, lang FROM documents
        |QUALIFY row_number() OVER (PARTITION BY md5(text)
        |  ORDER BY doc_id) = 1
        |ORDER BY doc_id LIMIT 200""".stripMargin,
    "dedup_containment" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_distinct(string_split_regex(
        |    trim(text), '\s+'))) AS t
        |  FROM documents WHERE doc_id < 300),
        |sz AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(CAST(common AS DOUBLE) / least(sa.sz, sb.sz), 6)
        |    AS containment,
        |  round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6)
        |    AS jaccard
        |FROM pairs
        |JOIN sz sa ON sa.doc_id = id_a
        |JOIN sz sb ON sb.doc_id = id_b
        |WHERE round(CAST(common AS DOUBLE) / least(sa.sz, sb.sz), 6) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_ngram" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_distinct(string_split_regex(
        |    trim(text), '\s+'))) AS t
        |  FROM documents WHERE doc_id < 100),
        |sz AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6)
        |    AS jaccard
        |FROM pairs
        |JOIN sz sa ON sa.doc_id = id_a
        |JOIN sz sb ON sb.doc_id = id_b
        |WHERE round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6)
        |  >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    "ssjoin_prefix" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_distinct(string_split_regex(
        |    trim(text), '\s+'))) AS t
        |  FROM documents WHERE doc_id < 300),
        |sz AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM tok a JOIN tok b ON a.t = b.t
        |    AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6)
        |    AS jaccard
        |FROM pairs
        |JOIN sz sa ON sa.doc_id = id_a
        |JOIN sz sb ON sb.doc_id = id_b
        |WHERE round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6)
        |  >= 0.95
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_embedding" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings WHERE vec_id < 300)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.35
        |ORDER BY id_a, id_b""".stripMargin,
    // compaction is a semantic no-op: the oracle is the blind sketch
    // replay with index side = corpus ∪ first increment, probe side =
    // second increment
    "dedup_index_compact" -> minhashOracleWith(
      "((a.doc_id % 5 <> 0 OR (a.doc_id % 5 = 0 AND a.doc_id < 100)) " +
        "AND b.doc_id % 5 = 0 AND b.doc_id >= 100)"),
    // SemDeDup replica: same seed centroids, same rounded-cosine argmax
    // (row_number ties to the smaller centroid id), same centroid-
    // proximity ranking, same W=8 predecessor window via a rank-band
    // self-join (band join ≡ the engine's collect_list frame).
    "dedup_semantic" ->
      """WITH m AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |cents AS (SELECT vec_id AS cid, v AS cv FROM m WHERE vec_id < 8),
        |scored AS (
        |  SELECT vec_id, v, cid,
        |    round(list_cosine_similarity(v, cv), 6) AS cc,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY round(list_cosine_similarity(v, cv), 6) DESC,
        |        cid) AS rn
        |  FROM m CROSS JOIN cents),
        |assigned AS (SELECT vec_id, v, cid AS cluster, cc AS cent_cos
        |  FROM scored WHERE rn = 1),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY cluster
        |    ORDER BY cent_cos DESC, vec_id) AS rk
        |  FROM assigned),
        |dup AS (
        |  SELECT a.cluster, a.vec_id,
        |    max(CASE WHEN round(list_cosine_similarity(a.v, b.v), 6)
        |      >= 0.35 THEN 1 ELSE 0 END) AS semantic_dup
        |  FROM ranked a JOIN ranked b
        |    ON a.cluster = b.cluster AND b.rk BETWEEN a.rk - 8 AND a.rk - 1
        |  GROUP BY a.cluster, a.vec_id)
        |SELECT r.cluster, r.vec_id, r.rk, r.cent_cos,
        |  coalesce(d.semantic_dup, 0) AS semantic_dup
        |FROM ranked r LEFT JOIN dup d
        |  ON r.cluster = d.cluster AND r.vec_id = d.vec_id
        |ORDER BY r.cluster, r.vec_id""".stripMargin
  )
}
