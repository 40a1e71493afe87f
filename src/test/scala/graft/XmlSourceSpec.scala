package graft

import org.apache.spark.sql.functions._
import graft.sources.Sources

class XmlSourceSpec extends SparkSpec {
  import spark.implicits._

  test("xml round-trip: schema, types, and entity escaping survive") {
    // the XML-specific hazard is markup in the data: &, <, >, quotes
    // must entity-encode on write and decode on read
    val df = Seq(
      (1L, "plain", 10.5),
      (2L, "amp & lt < gt > quot \" apos '", -3.25),
      (3L, "<row>fake markup</row>", 0.0))
      .toDF("id", "name", "v")
    val tmp = java.nio.file.Files.createTempDirectory("xml_spec").toString
    df.write.mode("overwrite").format("xml")
      .option("rootTag", "rows").option("rowTag", "row")
      .save(s"$tmp/d")
    val back = Sources.xml(spark, s"$tmp/d")
      .select(col("id").cast("long"), col("name"), col("v").cast("double"))
      .orderBy("id")
    assert(back.collect().toSeq === df.orderBy("id").collect().toSeq)
  }

  test("xml: Sources.file dispatches .xml; scan splits rows distributedly") {
    val tmp = java.nio.file.Files.createTempDirectory("xml_spec2").toString
    val n = 500
    spark.range(n).select(col("id"), (col("id") * 2).as("double_id"))
      .repartition(4) // multiple part files: the scan must glob them all
      .write.mode("overwrite").format("xml").option("rowTag", "row")
      .save(s"$tmp/r.xml")
    val back = Sources.file(spark, s"$tmp/r.xml")
    assert(back.count() === n)
    assert(back.agg(sum("double_id")).head().getLong(0) === (n.toLong * (n - 1)))
  }

  test("xml: nulls are omitted on write and come back null") {
    val tmp = java.nio.file.Files.createTempDirectory("xml_spec3").toString
    Seq((1L, Some("x")), (2L, None))
      .toDF("id", "name")
      .write.mode("overwrite").format("xml").option("rowTag", "row")
      .save(s"$tmp/d")
    val back = Sources.xml(spark, s"$tmp/d").orderBy("id").collect()
    assert(back(0).getString(1) === "x")
    assert(back(1).isNullAt(1))
  }
}
