package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Text analysis + dedup family over planted fixtures (the driver
  * testdata has no true dups, so semantics are pinned on a corpus with
  * known exact/near duplicates). */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the river bank today"
  private def corpus = Seq(
    (0L, base),
    (1L, base),                                             // exact dup of 0
    (2L, base.replace("quick", "fast")),                    // near dup of 0
    (3L, "completely different text about spark engines and distributed queries at scale"),
    (4L, "el perro come la comida y la casa es grande que bonita"),
    (5L, "der hund ist nicht ein freund und die katze")
  ).toDF("doc_id", "text")

  test("token counting: whitespace + bpe-ish") {
    val r = corpus.select(TextAnalysis.tokenCount($"text").as("t"),
      TextAnalysis.bpeishCount($"text").as("b")).orderBy($"t".desc).head()
    assert(r.getInt(0) == 14)
    val b = Seq("don't stop, it's 42km!").toDF("text")
      .select(TextAnalysis.bpeishCount($"text")).head().getInt(0)
    // don ' t stop , it ' s 42 km ! = 11 pieces
    assert(b == 11)
  }

  test("quality score in [0,1], english prose beats word soup") {
    val scores = corpus.select($"doc_id",
      TextAnalysis.qualityScore($"text").as("q")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(scores(0L) > scores(4L)) // english stopwords reward
  }

  test("language ID picks the language with most marker hits") {
    val r = corpus.select($"doc_id",
      TextAnalysis.predictLang($"text").as("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r(0L) == "en")
    assert(r(4L) == "es")
    assert(r(5L) == "de")
  }

  test("fingerprint: deterministic bottom-k shingle hashes") {
    val f1 = corpus.filter($"doc_id" === 0)
      .select(TextAnalysis.fingerprint($"text")).head().getSeq[String](0)
    val f2 = corpus.filter($"doc_id" === 1)
      .select(TextAnalysis.fingerprint($"text")).head().getSeq[String](0)
    assert(f1 == f2 && f1.size == 4 && f1 == f1.sorted)
  }

  test("exact dedup: hash groupBy keeps min id") {
    val out = Dedup.exactDedup(corpus, "text", "doc_id")
    assert(out.count() == 5)
    assert(out.filter($"doc_id" === 1).count() == 0) // dup of 0 dropped
    val stats = Dedup.exactDupStats(corpus, "text").head()
    assert(stats.getAs[Long]("n") == 6 && stats.getAs[Long]("n_dups") == 1)
  }

  test("ngram jaccard: finds exact and near dups, not unrelated") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
      n = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash LSH agrees with MLlib MinHashLSH on the planted corpus") {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    // same corpus through Spark's library implementation: token sets →
    // binary hashed features → LSH similarity self-join at J ≥ 0.7
    val toks = corpus.select($"doc_id",
      array_distinct(TextAnalysis.tokens(lower($"text"))).as("toks"))
    val feat = new HashingTF().setInputCol("toks").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true).transform(toks)
    val model = new MinHashLSH().setInputCol("features")
      .setOutputCol("hashes").setNumHashTables(8).setSeed(42L).fit(feat)
    val mllib = model.approxSimilarityJoin(feat, feat, 0.3, "dist")
      .filter(col("datasetA.doc_id") < col("datasetB.doc_id"))
      .select(col("datasetA.doc_id").as("id_a"),
        col("datasetB.doc_id").as("id_b"),
        round(lit(1.0) - col("dist"), 6).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val ours = Dedup.minhashLshPairs(corpus, "text", "doc_id",
        n = 1, numHashes = 32, bands = 8, verifyThreshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // the planted exact pair must be found by both with J = 1
    assert(ours.get((0L, 1L)).contains(1.0))
    assert(mllib.get((0L, 1L)).contains(1.0))
    // every pair both engines surface carries the same exact Jaccard
    for (key <- ours.keySet.intersect(mllib.keySet))
      assert(math.abs(ours(key) - mllib(key)) < 1e-6, s"pair $key")
    assert(ours.keySet.intersect(mllib.keySet).nonEmpty)
  }

  test("minhash LSH: near-dup candidates survive verification") {
    val pairs = Dedup.minhashLshPairs(corpus, "text", "doc_id",
      n = 2, numHashes = 32, bands = 16, verifyThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L && p._1 == 0L))
  }

  test("simhash: exact dups at distance 0, near dups close, unrelated far") {
    val sims = corpus.select($"doc_id",
      TextAnalysis.simhash64($"text").as("sim")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(0L) == sims(1L))
    val d02 = java.lang.Long.bitCount(sims(0L) ^ sims(2L))
    val d03 = java.lang.Long.bitCount(sims(0L) ^ sims(3L))
    assert(d02 < d03)
    val pairs = Dedup.simhashPairs(corpus, "text", "doc_id",
      maxHamming = math.max(3, d02))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("cosine expression matches hand computation") {
    val df = Seq((Array(1.0f, 0.0f, 1.0f), Array(0.0f, 1.0f, 1.0f)))
      .toDF("a", "b")
    val c = df.select(Dedup.cosine($"a", $"b")).head().getDouble(0)
    assert(math.abs(c - 0.5) < 1e-9)
  }

  test("embedding near-dups + identical vectors found") {
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(1.0f, 2.0f, 3.0f)),     // identical
      (2L, Array(1.0f, 2.0f, 3.1f)),     // near
      (3L, Array(-3.0f, 1.0f, -2.0f))    // far
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(vecs, "embedding", "vec_id", 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
    assert(!pairs.exists(_._2 == 3L))
  }

  test("incremental index dedup equals the self-join restricted to corpus × new") {
    val d = Tables.load(spark, sf0001, "documents")
      .filter($"doc_id" < 100)
    val corpus = d.filter($"doc_id" % 5 =!= 0)
    val fresh = d.filter($"doc_id" % 5 === 0)
    val idx = java.nio.file.Files.createTempDirectory("graft_mhidx_t").toString
    Dedup.buildMinhashIndex(corpus, "text", "doc_id", idx, n = 1,
      numHashes = 32, bands = 8, portableHash = true)
    val inc = Dedup.incrementalDupes(spark, fresh, "text", "doc_id", idx,
      n = 1, numHashes = 32, bands = 8, verifyThreshold = 0.8,
      portableHash = true)
      .collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    // all-at-once self-join, kept only where the pair crosses the split
    val full = Dedup.minhashLshPairs(d, "text", "doc_id", n = 1,
      numHashes = 32, bands = 8, verifyThreshold = 0.8,
      portableHash = true)
      .filter(($"id_a" % 5 === 0) =!= ($"id_b" % 5 === 0))
      .collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    assert(inc.nonEmpty && inc == full)
  }

  test("chunkTokens: sliding windows cover every token, overlap = window - stride") {
    import graft.text.TextAnalysis
    val doc = (1 to 100).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "a b c"), (3L, "   ")).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkTokens(df, "text", "doc_id",
      window = 32, stride = 24).collect()
    val d1 = chunks.filter(_.getLong(0) == 1L).sortBy(_.getInt(1))
    // starts 0,24,48,72,96 → 5 chunks; sizes 32,32,32,28,4 (tail kept)
    assert(d1.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3, 4))
    assert(d1.map(_.getInt(2)).toSeq == Seq(32, 32, 32, 28, 4))
    // consecutive chunks overlap by window - stride = 8 tokens
    val c0 = d1(0).getString(3).split(" ")
    val c1 = d1(1).getString(3).split(" ")
    assert(c0.takeRight(8).toSeq == c1.take(8).toSeq)
    // full coverage: union of chunk tokens = original tokens
    assert(d1.flatMap(_.getString(3).split(" ")).distinct.length == 100)
    // short doc → one short chunk; blank doc → no chunks
    val d2 = chunks.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getInt(2) == 3)
    assert(!chunks.exists(_.getLong(0) == 3L))
  }

  test("hashFeatures buckets deterministically and conserves token mass") {
    import spark.implicits._
    import graft.text.TextAnalysis
    val df = Seq((1L, "a b a c"), (2L, "a a")).toDF("id", "text")
    val out = TextAnalysis.hashFeatures(df, "id", "text", 64, "fh")
    // token mass conserved: counts sum to the token count per doc
    val mass = out.groupBy($"id").sum("n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mass === Map(1L -> 4L, 2L -> 2L))
    // same token, same bucket across docs: doc2's only bucket is one
    // of doc1's 'a' bucket
    val b2 = out.filter($"id" === 2L).select($"bucket").head.getLong(0)
    assert(out.filter($"id" === 1L && $"bucket" === b2).count() >= 1L)
    // buckets stay inside [0, 64)
    assert(out.filter($"bucket" < 0 || $"bucket" >= 64).count() === 0L)
    intercept[IllegalArgumentException] {
      TextAnalysis.hashFeatures(df, "id", "text", 0, "fh")
    }
  }

  test("spanDedup removes cross-doc 8-token spans, keeps within-doc repeats") {
    import spark.implicits._
    import graft.text.TextAnalysis
    val span = "q w e r t y u i" // 8 shared tokens
    val docs = Seq(
      (1L, s"alpha $span beta"),        // span at offset 1
      (2L, s"$span gamma delta"),       // span at offset 0
      (3L, "solo text with no shared span here at all"),
      (4L, "tiny doc"),                 // < k tokens: untouched
      (5L, "x y x y x y x y x y x y x y x y x y") // self-repeat only
    ).toDF("doc_id", "text")
    val out = TextAnalysis.spanDedup(docs, "text", "doc_id", k = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // the shared span vanishes from BOTH docs; their own words survive
    assert(out(1L) === ((10L, 8L, "alpha beta")))
    assert(out(2L) === ((10L, 8L, "gamma delta")))
    // unique doc and short doc untouched
    assert(out(3L)._2 === 0L && out(3L)._3 === "solo text with no shared span here at all")
    assert(out(4L) === ((2L, 0L, "tiny doc")))
    // within-ONE-doc repetition is df=1: not removed (cross-doc definition)
    assert(out(5L)._2 === 0L)
    intercept[IllegalArgumentException] {
      TextAnalysis.spanDedup(docs, "text", "doc_id", k = 8, minDocs = 1)
    }
  }

  test("spanDedup overlapping spans cover the union of positions") {
    import spark.implicits._
    import graft.text.TextAnalysis
    // 9 shared tokens -> two overlapping 8-grams in each doc; union
    // covers all 9 positions, not 16
    val nine = "a b c d e f g h i"
    val docs = Seq((1L, s"$nine tail1"), (2L, s"$nine tail2"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.spanDedup(docs, "text", "doc_id", k = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(1L) === ((9L, "tail1")))
    assert(out(2L) === ((9L, "tail2")))
  }

  test("distinctShingleRows equals shingleRows().distinct(), n=1 and n>1") {
    import spark.implicits._
    import graft.text.TextAnalysis
    // within-doc repeats (doc 5), cross-doc identical text (0/1),
    // multi-space + leading/trailing whitespace
    val docs = corpus.unionByName(
      Seq((6L, "  padded   spaces  padded   spaces ")).toDF("doc_id", "text"))
    for (n <- Seq(1, 2, 3)) {
      val viaDistinct = TextAnalysis.shingleRows(docs, "doc_id", "text", n)
        .distinct().orderBy($"id", $"shingle").collect().toSeq
      val rowLocal = TextAnalysis
        .distinctShingleRows(docs, "doc_id", "text", n)
        .orderBy($"id", $"shingle").collect().toSeq
      assert(rowLocal === viaDistinct, s"n=$n")
    }
  }

  test("spanDedup hash-keyed frequency equals a span-string replay") {
    import spark.implicits._
    import graft.text.TextAnalysis
    // reference form: same algorithm keyed on the raw 8-gram STRING —
    // pins that shuffling the xxhash64 proxy changes nothing
    val span = "q w e r t y u i"
    val docs = Seq(
      (1L, s"alpha $span beta"), (2L, s"$span gamma delta"),
      (3L, "solo text with no shared span here at all"),
      (4L, s"prefix words then $span again shared thrice"),
      (5L, "x y x y x y x y x y x y")).toDF("doc_id", "text")
    val k = 8
    val toks = docs.select($"doc_id", TextAnalysis.tokens($"text").as("__t"))
    val occ = toks.select($"doc_id",
      posexplode(TextAnalysis.shinglesOfTokens($"__t", k))
        .as(Seq("__off", "__gram")))
    val freq = occ.groupBy($"__gram")
      .agg(countDistinct($"doc_id").as("__df"))
      .filter($"__df" >= 2).select($"__gram")
    val expectStarts = occ.join(freq, "__gram")
      .groupBy($"doc_id").agg(sort_array(collect_set($"__off")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val got = TextAnalysis.spanDedup(docs, "text", "doc_id", k, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    // docs with replayed duplicated starts lose exactly those spans
    for ((id, starts) <- expectStarts) {
      val removed = starts.flatMap(s => s until s + k).distinct.size
      assert(got(id)._1 === removed.toLong, s"doc $id")
    }
    // docs absent from the replay lose nothing
    for (id <- Seq(3L, 5L)) assert(got(id)._1 === 0L)
  }
}
