package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.index.IndexLifecycle
import graft.similarity.Ann

/** The shared index-lifecycle kernel ([[graft.index.IndexLifecycle]])
  * and the crash/race hazards it closes in BOTH index families:
  *
  *  - vacuum idempotence across the rename→cleanup crash window (a
  *    stale increments dir left behind must not duplicate postings on
  *    the next vacuum);
  *  - snapshot-scoped cleanup (a tombstone appended after a
  *    maintenance pass's entry snapshot must survive it, unapplied but
  *    intact for the next pass — never a lost takedown);
  *  - type-preserving tombstones (a string-id corpus's delete must
  *    actually mask; the old cast-to-long produced null tombstones
  *    that matched nothing);
  *  - tombstone masking on EVERY probe API (`ivfIndexTopK`, not just
  *    the lifecycle-aware `ivfLiveTopK`);
  *  - `_SUCCESS`-guarded heal of a crash between the live delete and
  *    the staged rename.
  */
class IndexLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def emb: DataFrame =
    spark.read.parquet(s"$sf0001/embeddings.parquet")

  private def copyTree(src: Path, dst: Path): Unit = {
    Files.walk(src).iterator().asScala.toSeq.foreach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    }
    ()
  }

  test("vacuum is idempotent when a crash leaves a stale increments " +
      "dir behind (no duplicated postings, probe unchanged)") {
    val tmp = Files.createTempDirectory("graft_ilc_vac")
    val idx = tmp.resolve("idx").toString
    Ann.buildIvfIndex(emb.filter(col("vec_id") < 300), "embedding",
      "vec_id", idx, nlist = 8)
    Ann.appendIvfBatch(spark,
      emb.filter(col("vec_id") >= 300 && col("vec_id") < 400),
      "embedding", "vec_id", idx, batchId = 0L)
    // snapshot the increment log, then simulate the crash window: the
    // first vacuum completed its rename but died before deleting the
    // increments — restore them after the vacuum
    val incr = tmp.resolve("idx").resolve("increments")
    val saved = tmp.resolve("saved_incr")
    copyTree(incr, saved)
    Ann.vacuumIvfIndex(spark, idx)
    assert(!Files.isDirectory(incr))
    copyTree(saved, incr) // the stale, already-folded increment log
    Ann.vacuumIvfIndex(spark, idx) // must union + dedup, not duplicate
    val dupIds = spark.read.parquet(s"$idx/postings")
      .groupBy(col("corpus_id")).count().filter(col("count") > 1).count()
    assert(dupIds === 0L)
    // the probe must match a never-incremented, never-vacuumed rebuild
    // over the same 400 vectors with the same codebook
    val fresh = tmp.resolve("fresh").toString
    val codebook = spark.read.parquet(s"$idx/codebook")
      .orderBy(col("cell")).collect().map(_.getSeq[Double](1).toArray)
    Ann.buildIvfIndex(emb.filter(col("vec_id") < 400), "embedding",
      "vec_id", fresh, nlist = 8, codebook = Some(codebook))
    val q = emb.filter(col("vec_id") < 5)
    val got = Ann.ivfIndexTopK(spark, q, "embedding", "vec_id", idx,
      k = 3, nprobe = 3).orderBy("query_id", "rank")
      .collect().map(_.toSeq).toSeq
    val want = Ann.ivfIndexTopK(spark, q, "embedding", "vec_id", fresh,
      k = 3, nprobe = 3).orderBy("query_id", "rank")
      .collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("a tombstone appended after the maintenance snapshot survives " +
      "the pass for the next one (no lost takedown)") {
    val tmp = Files.createTempDirectory("graft_ilc_snap")
    val dir = tmp.resolve("tombstones").toString
    IndexLifecycle.appendTombstones(Seq(1L, 2L).toDF("id"), "id", "id",
      dir)
    val snap = IndexLifecycle.snapshotFiles(dir)
    assert(snap.nonEmpty)
    // a concurrent delete lands between the pass's scan and its cleanup
    IndexLifecycle.appendTombstones(Seq(3L).toDF("id"), "id", "id", dir)
    IndexLifecycle.deleteSnapshot(dir, snap)
    // the snapshot's files are gone; the late tombstone is intact
    val left = spark.read.parquet(dir).select("id")
      .as[Long].collect().toSeq
    assert(left === Seq(3L))
  }

  test("string-id takedown masks (tombstone type preserved, not " +
      "cast-to-long nulls)") {
    val tmp = Files.createTempDirectory("graft_ilc_str")
    val idx = tmp.resolve("idx").toString
    val corpus = emb.filter(col("vec_id") < 200)
      .select(concat(lit("v-"), col("vec_id")).as("sid"),
        col("embedding"))
    Ann.buildIvfIndex(corpus, "embedding", "sid", idx, nlist = 4)
    val queries = corpus.limit(3)
    val before = Ann.ivfLiveTopK(spark, queries, "embedding", "sid",
      idx, k = 5, nprobe = 4)
    val victim = before.select(col("corpus_id")).limit(1)
      .collect().head.getString(0)
    Ann.deleteFromIvfIndex(Seq(victim).toDF("sid"), "sid", idx)
    // the tombstone file keeps the string type on disk
    val tombType = spark.read.parquet(s"$idx/tombstones")
      .schema("corpus_id").dataType
    assert(tombType === org.apache.spark.sql.types.StringType)
    // …and the delete is actually visible: the victim never surfaces
    val after = Ann.ivfLiveTopK(spark, queries, "embedding", "sid",
      idx, k = 5, nprobe = 4)
      .filter(col("corpus_id") === victim).count()
    assert(after === 0L)
  }

  test("ivfIndexTopK honors tombstones too (no takedown leakage when " +
      "probe APIs are mixed)") {
    val tmp = Files.createTempDirectory("graft_ilc_mix")
    val idx = tmp.resolve("idx").toString
    Ann.buildIvfIndex(emb.filter(col("vec_id") < 300), "embedding",
      "vec_id", idx, nlist = 8)
    val q = emb.filter(col("vec_id") < 3)
    val victim = Ann.ivfIndexTopK(spark, q, "embedding", "vec_id", idx,
        k = 3, nprobe = 3)
      .select(col("corpus_id")).limit(1).collect().head.getLong(0)
    Ann.deleteFromIvfIndex(Seq(victim).toDF("vec_id"), "vec_id", idx)
    val leaked = Ann.ivfIndexTopK(spark, q, "embedding", "vec_id", idx,
        k = 3, nprobe = 3)
      .filter(col("corpus_id") === victim).count()
    assert(leaked === 0L)
  }

  test("healStaged folds a complete staged dir in; an incomplete one " +
      "is left for the rebuild") {
    val tmp = Files.createTempDirectory("graft_ilc_heal")
    val live = tmp.resolve("live")
    val staged = tmp.resolve("staged")
    // incomplete staged (no _SUCCESS): not healed
    Files.createDirectories(staged)
    Files.writeString(staged.resolve("part-0"), "x")
    assert(!IndexLifecycle.healStaged(live, staged))
    assert(!Files.isDirectory(live))
    // complete staged: healed into live
    Files.writeString(staged.resolve("_SUCCESS"), "")
    assert(IndexLifecycle.healStaged(live, staged))
    assert(Files.isDirectory(live) &&
      Files.exists(live.resolve("part-0")) && !Files.exists(staged))
    // live present: heal is a no-op even with a complete staged dir
    Files.createDirectories(staged)
    Files.writeString(staged.resolve("_SUCCESS"), "")
    assert(!IndexLifecycle.healStaged(live, staged))
  }

  test("string-id takedown masks on the MinHash side too") {
    val tmp = Files.createTempDirectory("graft_ilc_mh")
    val idx = tmp.resolve("idx").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 200)
      .select(concat(lit("d-"), col("doc_id")).as("sid"), col("text"))
    graft.dedup.Dedup.buildMinhashIndex(docs, "text", "sid", idx)
    val probe = docs.limit(40)
      .withColumn("sid", concat(lit("new-"), col("sid")))
    val before = graft.dedup.Dedup.incrementalDupes(spark, probe,
      "text", "sid", idx, verifyThreshold = 0.9)
    assert(before.count() > 0L) // identical texts: must match initially
    val victims = before.select(col("id_a").as("sid")).distinct()
    graft.dedup.Dedup.deleteFromMinhashIndex(victims, "sid", idx)
    val after = graft.dedup.Dedup.incrementalDupes(spark, probe,
      "text", "sid", idx, verifyThreshold = 0.9)
    assert(after.count() === 0L)
  }
}
