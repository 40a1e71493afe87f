package graft

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.streaming.Streaming

/** The streaming near-dup harness's contract: the emitted pair set is
  * BATCH-SPLIT INVARIANT (1 file ≡ 2 files ≡ the one-shot batch
  * composition incrementalDupes ∪ minhashLshPairs), cross-batch pairs
  * are caught through the APPENDED index without any rescan, and the
  * per-batch overwrite keeps results exactly-once under replay. */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda")

  private def text(changed: Int, tag: String): String =
    (base.take(10) ++ Vector.fill(changed)(tag)).drop(changed)
      .mkString(" ")

  // hist 1..4; fresh 10..13. Planted: 11 ~ 1 (hist×new), 12 ~ 11
  // (new×new, plan both batches), 13 unique.
  private val hist = Seq(
    (1L, text(0, "")),                      // original
    (2L, "one two three four five six seven eight nine ten"),
    (3L, "uno dos tres cuatro cinco seis siete ocho nueve diez"),
    (4L, "en to tre fire fem seks syv otte ni ti"))
  private val fresh = Seq(
    (10L, "un deux trois quatre cinq six sept huit neuf dix"),
    (11L, text(1, "omega")),                // ~ 1 and ~ 12
    (12L, text(1, "omega")),                // exact dup of 11
    (13L, "yksi kaksi kolme nelja viisi kuusi seitseman kahdeksan"))

  private def stage(df: DataFrame, dst: Path, mtime: Long): Unit = {
    val gen = Files.createTempDirectory("graft_ndds_gen")
    df.coalesce(1).write.mode("overwrite").parquet(gen.toString)
    val part = Files.list(gen).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    Files.copy(part, dst)
    Files.setLastModifiedTime(dst, FileTime.fromMillis(mtime))
    ()
  }

  /** Run the stream over the given staged splits; return the pair set. */
  private def run(splits: Seq[Seq[(Long, String)]]): Set[(Long, Long, Double)] = {
    val tmp = Files.createTempDirectory("graft_ndds")
    val idx = tmp.resolve("idx").toString
    Dedup.buildMinhashIndex(hist.toDF("doc_id", "text"), "text", "doc_id",
      idx, n = 1, numHashes = 32, bands = 8, portableHash = true)
    val stageDir = Files.createDirectory(tmp.resolve("stage"))
    splits.zipWithIndex.foreach { case (rows, i) =>
      stage(rows.toDF("doc_id", "text"),
        stageDir.resolve(s"b$i.parquet"), 1000000L + i * 1000L)
    }
    val stream = spark.readStream
      .schema(fresh.toDF("doc_id", "text").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stageDir.toString)
    val res = tmp.resolve("res").toString
    val q = Streaming.nearDupStream(stream, "text", "doc_id", idx, res,
      tmp.resolve("ckpt").toString, n = 1, numHashes = 32, bands = 8,
      verifyThreshold = 0.8, portableHash = true).start()
    q.awaitTermination()
    spark.read.parquet(res).select(col("id_a"), col("id_b"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
  }

  test("one batch ≡ two batches ≡ the one-shot composition") {
    val twoWay = run(Seq(fresh.take(2), fresh.drop(2)))  // 11 and 12 split
    val oneWay = run(Seq(fresh))
    assert(twoWay === oneWay, "batch-split changed the emitted pair set")

    // one-shot composition over the same inputs
    val tmp = Files.createTempDirectory("graft_ndds_ref")
    val idx = tmp.resolve("idx").toString
    Dedup.buildMinhashIndex(hist.toDF("doc_id", "text"), "text", "doc_id",
      idx, n = 1, numHashes = 32, bands = 8, portableHash = true)
    val freshDf = fresh.toDF("doc_id", "text")
    val expect = Dedup.incrementalDupes(spark, freshDf, "text", "doc_id",
        idx, n = 1, numHashes = 32, bands = 8, verifyThreshold = 0.8,
        portableHash = true)
      .unionByName(Dedup.minhashLshPairs(freshDf, "text", "doc_id",
        n = 1, numHashes = 32, bands = 8, verifyThreshold = 0.8,
        portableHash = true))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(oneWay === expect, "stream diverged from the batch composition")

    // the planted shapes are all present: hist×new, new×new cross-batch
    assert(oneWay.exists { case (a, b, _) => a == 1L && b == 11L },
      "hist-vs-new dup missed")
    assert(oneWay.exists { case (a, b, _) => a == 11L && b == 12L },
      "new-vs-new dup missed")
    assert(!oneWay.exists { case (a, b, _) => a == 13L || b == 13L },
      "unique doc falsely paired")
  }
}
