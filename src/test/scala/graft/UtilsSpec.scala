package graft

import java.nio.file.{Files, Paths}
import graft.etl.Utils
import graft.transform.FieldRule
import graft.sources.Sources

class UtilsSpec extends SparkSpec {
  import spark.implicits._

  test("single-file writers round-trip through the file sources") {
    val dir = Files.createTempDirectory("graft_utils").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Utils.writeSingleFile(df, s"$dir/d.json")
    assert(Sources.file(spark, s"$dir/d.json").count() == 2)
    Utils.writeSingleFile(df, s"$dir/d.jsonl")
    assert(Sources.file(spark, s"$dir/d.jsonl").count() == 2)
    Utils.writeSingleFile(df, s"$dir/d.csv")
    val csv = Sources.file(spark, s"$dir/d.csv")
    assert(csv.count() == 2 && csv.columns.toSeq == Seq("id", "v"))
    Utils.writeSingleFile(df, s"$dir/d.yaml")
    val y = Sources.yaml(spark, s"$dir/d.yaml")
    assert(y.count() == 2)
    assert(y.where($"id" === "2").head().getAs[String]("v") == "b")
    intercept[IllegalArgumentException](
      Utils.writeSingleFile(df, s"$dir/d.xml"))
  }

  test("single-file row cap is enforced, loudly, before any collect") {
    val dir = Files.createTempDirectory("graft_utils_cap").toString
    val big = spark.range(0, 50).toDF("id")
    val e = intercept[IllegalStateException](
      Utils.writeSingleFile(big, s"$dir/big.jsonl", maxRows = 10L))
    assert(e.getMessage.contains("single-file cap of 10 rows"))
    assert(e.getMessage.contains("Sinks.load"))
    assert(!Files.exists(Paths.get(s"$dir/big.jsonl")),
      "guard must trip before anything is written")
    // exactly at the cap still writes
    Utils.writeSingleFile(big, s"$dir/ok.jsonl", maxRows = 50L)
    assert(Sources.file(spark, s"$dir/ok.jsonl").count() == 50)
    intercept[IllegalArgumentException](
      Utils.writeSingleFile(big, s"$dir/x.jsonl", maxRows = 0L))
  }

  test("deep config merge: later wins, nested maps merge (common_utils.py:354)") {
    val a = Map("db" -> Map("host" -> "x", "port" -> 1), "n" -> 1)
    val b = Map("db" -> Map("port" -> 2), "m" -> 3)
    val merged = Utils.mergeConfigs(a, b)
    assert(merged("n") == 1 && merged("m") == 3)
    assert(merged("db") == Map("host" -> "x", "port" -> 2))
  }

  test("schema compatibility: required fields must exist (common_utils.py:431)") {
    val t = Seq((1L, "x")).toDF("id", "v").schema
    assert(Utils.schemaCompatible(Map("id" -> FieldRule(required = true)), t))
    assert(!Utils.schemaCompatible(Map("zz" -> FieldRule(required = true)), t))
    assert(Utils.schemaCompatible(Map("zz" -> FieldRule()), t)) // optional ok
  }

  test("timed returns result and duration") {
    val (r, s) = Utils.timed { Thread.sleep(20); 42 }
    assert(r == 42 && s >= 0.02)
  }

  test("scratchDir: same prefix replaces, no sibling accumulation") {
    val first = Utils.scratchDir("graft_scratch_test")
    Files.writeString(Paths.get(first, "stale.bin"), "x")
    val second = Utils.scratchDir("graft_scratch_test")
    // same path reused — a bench loop rebuilding an index N times holds
    // at most one copy, and the previous round's files are gone
    assert(second == first)
    assert(!Files.exists(Paths.get(second, "stale.bin")))
    // distinct prefixes coexist under the one process-wide root
    val other = Utils.scratchDir("graft_scratch_other")
    assert(other != first &&
      Paths.get(other).getParent == Paths.get(first).getParent)
  }
}
