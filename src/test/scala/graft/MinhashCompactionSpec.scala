package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Compaction contract: a semantic NO-OP on the index (identical
  * incremental results before/after), while physically collapsing
  * replay-duplicate rows and bounding the file count. */
class MinhashCompactionSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "one two three four five six seven eight nine ten"),
    (3L, "uno dos tres cuatro cinco seis siete ocho nueve diez"))
  private val inc1 = Seq(
    (10L, "alpha beta gamma delta epsilon zeta eta theta iota omega"),
    (11L, "en to tre fire fem seks syv otte ni ti"))
  private val probe = Seq(
    (20L, "alpha beta gamma delta epsilon zeta eta theta iota omega"),
    (21L, "un deux trois quatre cinq six sept huit neuf dix"))

  private def params = (1, 32, 8, true) // n, hashes, bands, portable

  private def run(idx: String) = {
    val (n, h, b, p) = params
    Dedup.incrementalDupes(spark, probe.toDF("doc_id", "text"),
        "text", "doc_id", idx, n, h, b,
        verifyThreshold = 0.8, portableHash = p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
  }

  test("compaction: same answers, duplicates collapsed, few files") {
    val (n, h, b, p) = params
    val idx = Files.createTempDirectory("graft_cmp").toString
    Dedup.buildMinhashIndex(corpus.toDF("doc_id", "text"),
      "text", "doc_id", idx, n, h, b, p)
    // append the increment TWICE — a simulated at-least-once replay
    Dedup.appendToMinhashIndex(inc1.toDF("doc_id", "text"),
      "text", "doc_id", idx, n, h, b, p)
    Dedup.appendToMinhashIndex(inc1.toDF("doc_id", "text"),
      "text", "doc_id", idx, n, h, b, p)
    val before = run(idx)
    val rawRows = spark.read.parquet(s"$idx/buckets").count()
    val distinctRows = spark.read.parquet(s"$idx/buckets")
      .distinct().count()
    assert(rawRows > distinctRows, "replay duplicates should exist")

    Dedup.compactMinhashIndex(spark, idx, files = 2)
    assert(run(idx) === before, "compaction changed the answers")
    assert(spark.read.parquet(s"$idx/buckets").count() === distinctRows,
      "compaction should collapse duplicate sketch rows")
    import scala.jdk.CollectionConverters._
    val parts = Files.list(java.nio.file.Paths.get(s"$idx/buckets"))
      .iterator().asScala.count(_.toString.endsWith(".parquet"))
    assert(parts <= 2, s"expected <= 2 bucket files, got $parts")
    // the planted cross-increment duplicate is still found: probe 20
    // matches indexed 10 exactly
    assert(run(idx).exists { case (a, bb, j) =>
      a == 10L && bb == 20L && j == 1.0 })
    // re-running compaction (heal path) is also a no-op
    Dedup.compactMinhashIndex(spark, idx, files = 2)
    assert(run(idx) === before)
  }

  test("takedown: delete masks immediately, compaction purges the " +
      "bytes, purged index equals never-indexed") {
    val (n, h, b, p) = params
    // doc 10 is the probe's exact duplicate — the takedown target
    val idx = Files.createTempDirectory("graft_del").toString
    Dedup.buildMinhashIndex((corpus ++ inc1).toDF("doc_id", "text"),
      "text", "doc_id", idx, n, h, b, p)
    assert(run(idx).exists(_._1 == 10L), "premise: doc 10 matches")
    Dedup.deleteFromMinhashIndex(Seq(10L).toDF("doc_id"), "doc_id", idx)
    val masked = run(idx)
    assert(!masked.exists(_._1 == 10L), "tombstoned doc still matching")
    // double-delete is idempotent
    Dedup.deleteFromMinhashIndex(Seq(10L).toDF("doc_id"), "doc_id", idx)
    assert(run(idx) === masked)
    Dedup.compactMinhashIndex(spark, idx)
    assert(run(idx) === masked, "compaction changed the masked answers")
    // physical purge: no trace of doc 10 in either file set, and the
    // tombstones are consumed
    assert(spark.read.parquet(s"$idx/buckets")
      .filter(col("id") === 10L).count() === 0L, "sketch bytes survived")
    assert(spark.read.parquet(s"$idx/tokens")
      .filter(col("id") === 10L).count() === 0L, "token bytes survived")
    assert(!Files.isDirectory(java.nio.file.Paths.get(idx, "tombstones")))
    // purged ≡ never-indexed: a fresh index without doc 10 answers
    // identically
    val clean = Files.createTempDirectory("graft_del_ref").toString
    Dedup.buildMinhashIndex(
      (corpus ++ inc1.filterNot(_._1 == 10L)).toDF("doc_id", "text"),
      "text", "doc_id", clean, n, h, b, p)
    assert(run(clean) === masked)
  }

  test("takedown property: purge ≡ never-indexed on random corpora " +
      "and random delete sets") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val vocab = Vector("red", "blue", "green", "gold", "gray", "teal",
      "pink", "cyan", "plum", "jade", "rust", "sand")
    val gen = for {
      nDocs <- Gen.choose(6, 14)
      texts <- Gen.listOfN(nDocs, Gen.choose(0, vocab.size - 3).flatMap(
        d => Gen.const(vocab.drop(d).take(8).mkString(" "))))
      dels <- Gen.someOf(0 until nDocs)
    } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      dels.map(_.toLong).toSet)
    val (n, h, b, p) = params
    val probeDf = probe.toDF("doc_id", "text")
    def answers(idx: String) =
      Dedup.incrementalDupes(spark, probeDf, "text", "doc_id", idx,
          n, h, b, verifyThreshold = 0.5, portableHash = p)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    for (i <- 0 until 5) {
      val (docs, dels) = gen(Gen.Parameters.default, Seed(900L + i)).get
      val purged = Files.createTempDirectory("graft_delp").toString
      Dedup.buildMinhashIndex(docs.toDF("doc_id", "text"),
        "text", "doc_id", purged, n, h, b, p)
      Dedup.deleteFromMinhashIndex(dels.toSeq.toDF("doc_id"),
        "doc_id", purged)
      val masked = answers(purged) // tombstone-mask path
      Dedup.compactMinhashIndex(spark, purged)
      val clean = Files.createTempDirectory("graft_delc").toString
      Dedup.buildMinhashIndex(
        docs.filterNot(d => dels(d._1)).toDF("doc_id", "text"),
        "text", "doc_id", clean, n, h, b, p)
      val want = answers(clean)
      assert(masked === want, s"case $i (mask): dels=$dels")
      assert(answers(purged) === want, s"case $i (purge): dels=$dels")
    }
  }

  test("build + append ≡ build-once, under any random split") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val vocab = Vector("red", "blue", "green", "gold", "gray", "teal",
      "pink", "cyan", "plum", "jade", "rust", "sand")
    val gen = for {
      nDocs <- Gen.choose(6, 16)
      texts <- Gen.listOfN(nDocs, Gen.choose(0, vocab.size - 3).flatMap(
        d => Gen.const(vocab.drop(d).take(8).mkString(" "))))
      cut <- Gen.choose(1, nDocs - 1)
    } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }, cut)
    val (n, h, b, p) = params
    for (i <- 0 until 6) {
      val (docs, cut) = gen(Gen.Parameters.default, Seed(300L + i)).get
      val (part1, part2) = docs.splitAt(cut)
      val probeDf = probe.toDF("doc_id", "text")
      def answers(idx: String) =
        Dedup.incrementalDupes(spark, probeDf, "text", "doc_id", idx,
            n, h, b, verifyThreshold = 0.5, portableHash = p)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val once = Files.createTempDirectory("graft_cmp_once").toString
      Dedup.buildMinhashIndex(docs.toDF("doc_id", "text"),
        "text", "doc_id", once, n, h, b, p)
      val split = Files.createTempDirectory("graft_cmp_split").toString
      Dedup.buildMinhashIndex(part1.toDF("doc_id", "text"),
        "text", "doc_id", split, n, h, b, p)
      Dedup.appendToMinhashIndex(part2.toDF("doc_id", "text"),
        "text", "doc_id", split, n, h, b, p)
      assert(answers(split) === answers(once),
        s"case $i: cut=$cut docs=${docs.map(_._1)}")
    }
  }
}
