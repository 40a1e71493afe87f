package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.curation.Curation

/** Property tests for DSIR-style importance weighting
  * ([[Curation.dsirWeights]]): the distributed pipeline (md5-bucketed
  * histograms, broadcast log-ratio table, doc-grain aggregate) must
  * equal a brute-force in-memory reference on arbitrary random corpora,
  * and the sign semantics must behave — target-composed documents score
  * positive, raw-only documents negative. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 256

  /** The md5 bridge, in-memory: first 7 hex chars of md5(token) mod B. */
  private def bucket(t: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 7)
    java.lang.Long.parseLong(hex, 16) % B
  }

  private def toks(text: String): Seq[String] =
    text.trim.split("\\s+").toSeq.filter(_.nonEmpty)

  /** Brute-force reference: id -> (n_tokens, unrounded logw). */
  private def ref(docs: Seq[(Long, String, Boolean)])
      : Map[Long, (Long, Double)] = {
    val all = docs.flatMap { case (id, text, tgt) =>
      toks(text).map(t => (id, bucket(t), tgt))
    }
    val raw = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tgt = all.filter(_._3).groupBy(_._2)
      .view.mapValues(_.size.toLong).toMap
    val nR = raw.values.sum.toDouble
    val nT = tgt.values.sum.toDouble
    val llr = raw.map { case (b, cR) =>
      b -> math.log(((tgt.getOrElse(b, 0L) + 1L) / (nT + B)) /
        ((cR + 1L) / (nR + B)))
    }
    all.groupBy(_._1).map { case (id, rows) =>
      id -> (rows.size.toLong, rows.map(r => llr(r._2)).sum)
    }
  }

  private def run(docs: Seq[(Long, String, Boolean)])
      : Map[Long, (Long, Double, Boolean)] = {
    val df = docs.toDF("doc_id", "text", "is_tgt")
    Curation.dsirWeights(df, "doc_id", "text", col("is_tgt"), B)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
  }

  private val word: Gen[String] =
    Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "mu", "nu")
  private val doc: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))

  test("dsirWeights equals the in-memory reference on random corpora") {
    (0 until 5).foreach { trial =>
      val n = 20 + trial * 7
      val texts = (0 until n).flatMap(i =>
        doc.apply(Gen.Parameters.default, Seed(trial * 1000L + i)))
      val docs = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, i % 3 == 0)
      }
      val got = run(docs)
      val want = ref(docs)
      assert(got.keySet === want.keySet)
      want.foreach { case (id, (nTok, lw)) =>
        val (gn, glw, gsel) = got(id)
        assert(gn === nTok, s"n_tokens of doc $id")
        assert(math.abs(glw - lw) < 1e-6, s"logw of doc $id")
        if (math.abs(lw) > 1e-5)
          assert(gsel === (lw > 0), s"selected of doc $id")
      }
    }
  }

  test("target-composed docs score positive, raw-only negative") {
    // target docs use one vocabulary, raw-only docs a disjoint one:
    // every target-vocab bucket is relatively enriched under the
    // target histogram, so the pure-target doc must come out selected
    // and the pure-raw doc must not. Counts are repeated well past the
    // bucket count so add-1 smoothing (which shrinks ratios toward 1
    // when B >> counts) cannot flip the signs.
    def rep(s: String) = (s + " ") * 50
    val docs = Seq[(Long, String, Boolean)](
      (1L, rep("alpha beta"), true),
      (2L, rep("beta alpha"), true),
      (3L, rep("gamma delta"), false),
      (4L, rep("delta gamma"), false),
      (5L, rep("alpha gamma"), false)) // mixed probe doc
    val got = run(docs)
    assert(got(1L)._3 && got(2L)._3, "pure-target docs selected")
    assert(!got(3L)._3 && !got(4L)._3, "pure-raw docs rejected")
    assert(got(1L)._2 > got(5L)._2 && got(5L)._2 > got(3L)._2,
      "mixed doc scores strictly between pure-target and pure-raw")
  }

  /** Reference for the FROZEN-artifact path: histograms from `train`
    * only, every bucket materialized (unseen → pure smoothing ratio),
    * scoring over `score`. */
  private def refFrozen(train: Seq[(Long, String, Boolean)],
      score: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    val hist = train.flatMap { case (_, text, tgt) =>
      toks(text).map(t => (bucket(t), tgt))
    }
    val raw = hist.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val tgt = hist.filter(_._2).groupBy(_._1)
      .view.mapValues(_.size.toLong).toMap
    val nR = raw.values.sum.toDouble
    val nT = tgt.values.sum.toDouble
    def llr(b: Long): Double =
      math.log(((tgt.getOrElse(b, 0L) + 1L) / (nT + B)) /
        ((raw.getOrElse(b, 0L) + 1L) / (nR + B)))
    score.map { case (id, text) =>
      val bs = toks(text).map(bucket)
      id -> (bs.size.toLong, bs.map(llr).sum)
    }.filter(_._2._1 > 0).toMap
  }

  test("frozen dsirTable + dsirScore equals the reference on disjoint " +
      "corpora, including never-seen buckets") {
    val train = (0 until 25).flatMap(i =>
        doc.apply(Gen.Parameters.default, Seed(5000L + i)))
      .zipWithIndex.map { case (t, i) => (i.toLong, t, i % 2 == 0) }
    // the score corpus includes vocabulary the train corpus never saw
    val score = Seq[(Long, String)](
      (100L, "alpha beta NOVELTOKEN"), (101L, "omicron sigma rho"),
      (102L, train.head._2))
    val table = Curation.dsirTable(train.toDF("doc_id", "text", "is_tgt"),
      "doc_id", "text", col("is_tgt"), B)
    assert(table.count() === B.toLong, "table materializes every bucket")
    val got = Curation.dsirScore(score.toDF("doc_id", "text"),
        "doc_id", "text", table, B)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val want = refFrozen(train, score)
    assert(got.keySet === want.keySet)
    want.foreach { case (id, (n, lw)) =>
      assert(got(id)._1 === n, s"n_tokens of doc $id")
      assert(math.abs(got(id)._2 - lw) < 1e-6, s"logw of doc $id")
    }
  }

  test("the streamed gate equals one-shot scoring for any batch split") {
    import java.nio.file.Files
    import java.nio.file.attribute.FileTime
    import scala.jdk.CollectionConverters._
    val train = (0 until 25).flatMap(i =>
        doc.apply(Gen.Parameters.default, Seed(7000L + i)))
      .zipWithIndex.map { case (t, i) => (i.toLong, t, i % 2 == 0) }
    val fresh = (0 until 12).flatMap(i =>
        doc.apply(Gen.Parameters.default, Seed(8000L + i)))
      .zipWithIndex.map { case (t, i) => (100L + i, t) }
    val tmp = Files.createTempDirectory("graft_dsir_gate")
    val tablePath = tmp.resolve("table").toString
    Curation.dsirTable(train.toDF("doc_id", "text", "is_tgt"),
        "doc_id", "text", col("is_tgt"), B)
      .write.parquet(tablePath)
    val freshDf = fresh.toDF("doc_id", "text")
    val stage = Files.createDirectory(tmp.resolve("stage"))
    def stageOne(ids: Seq[Long], name: String, mtime: Long): Unit = {
      val gen = Files.createTempDirectory("graft_dsir_stage")
      freshDf.filter(col("doc_id").isin(ids: _*)).coalesce(1)
        .write.mode("overwrite").parquet(gen.toString)
      val part = Files.list(gen).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(part, stage.resolve(name))
      Files.setLastModifiedTime(stage.resolve(name),
        FileTime.fromMillis(mtime))
      ()
    }
    val (b0, b1) = fresh.map(_._1).partition(_ < 106L)
    stageOne(b0, "b0.parquet", 1000000L)
    stageOne(b1, "b1.parquet", 2000000L)
    val stream = spark.readStream.schema(freshDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    val res = tmp.resolve("res").toString
    val q = graft.streaming.Streaming.dsirGateStream(stream, "text",
      "doc_id", tablePath, res, tmp.resolve("ckpt").toString, B).start()
    q.awaitTermination()
    val streamed = spark.read.parquet(res)
      .select(col("id"), col("n_tokens"), col("logw"), col("selected"))
      .orderBy(col("id")).collect().map(_.toSeq).toSeq
    val oneShot = Curation.dsirScore(freshDf, "doc_id", "text",
        spark.read.parquet(tablePath), B)
      .orderBy(col("id")).collect().map(_.toSeq).toSeq
    assert(streamed === oneShot)
  }

  test("zero-token docs drop; weights are length-additive") {
    val docs = Seq[(Long, String, Boolean)](
      (1L, "alpha", true), (2L, "alpha alpha", true),
      (3L, "   ", false), (4L, "beta", false))
    val got = run(docs)
    assert(!got.contains(3L), "whitespace-only doc emits no row")
    // doubling a doc's tokens doubles its (unrounded) weight
    assert(math.abs(got(2L)._2 - 2 * got(1L)._2) < 2e-6)
  }
}
