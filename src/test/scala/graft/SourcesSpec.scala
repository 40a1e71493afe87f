package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Sources

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("S1 table scan with raw WHERE pushdown + limit (base_extractors.py:47-84)") {
    val df = Sources.table(spark, sf0001, "lineitem",
      where = Some("l_quantity > 45 AND l_returnflag = 'A'"), limit = Some(10))
    val rows = df.collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Double]("l_quantity") > 45))
  }

  test("S2 collection scan with filter_dict equality conjunction (mongo_connector.py:95-116)") {
    val df = Sources.collection(spark, sf0001, "events",
      filterDict = Map("event_type" -> "error"))
    assert(df.select("event_type").distinct().as[String].collect()
      .toSeq == Seq("error"))
  }

  test("S3 time-range scan with fixed now (influx_connector.py:142-189)") {
    val now = to_timestamp(lit("2024-01-02 00:00:00"))
    val df = Sources.timeRange(spark, sf0001, "events", "ts",
      start = "-24h", stop = "now()", now = now)
    val cnt = df.count()
    assert(cnt > 0)
    val manual = Tables.load(spark, sf0001, "events")
      .where($"ts" >= "2024-01-01 00:00:00" && $"ts" < "2024-01-02 00:00:00")
      .count()
    assert(cnt == manual)
  }

  test("S3 absolute range bounds") {
    val df = Sources.timeRange(spark, sf0001, "events", "ts",
      start = "2024-01-01 00:00:00", stop = "2024-01-01 06:00:00")
    assert(df.agg(max($"ts").cast("string")).head().getString(0) < "2024-01-01 06:00:00")
  }

  test("wide↔long reshape round trip (influx long format)") {
    val df = Seq((1L, "h1", 0.5, 10.0), (2L, "h2", 0.7, 20.0))
      .toDF("time", "host", "cpu", "mem")
    val long = Sources.toLong(df, "time", Seq("host"), Seq("cpu", "mem"))
    assert(long.count() == 4)
    assert(long.columns.toSeq == Seq("time", "host", "field", "value"))
    val wide = Sources.toWide(long, "time", Seq("host"))
    val r = wide.orderBy("time").collect()
    assert(r(0).getAs[Double]("cpu") == 0.5 && r(1).getAs[Double]("mem") == 20.0)
  }

  test("S4 file scans: csv/json/jsonl round trip (base_extractors.py:195-230)") {
    val dir = Files.createTempDirectory("graft_files").toString
    // csv
    Files.writeString(java.nio.file.Paths.get(s"$dir/d.csv"),
      "a,b\n1,x\n2,\n")
    val csv = Sources.file(spark, s"$dir/d.csv")
    assert(csv.count() == 2)
    assert(csv.where($"b".isNull).count() == 1) // empty → null
    // json array (whole-file)
    Files.writeString(java.nio.file.Paths.get(s"$dir/d.json"),
      """[{"a": 1, "b": "x"}, {"a": 2}]""")
    assert(Sources.file(spark, s"$dir/d.json").count() == 2)
    // jsonl
    Files.writeString(java.nio.file.Paths.get(s"$dir/d.jsonl"),
      "{\"a\": 1}\n{\"a\": 2}\n{\"a\": 3}\n")
    assert(Sources.file(spark, s"$dir/d.jsonl").count() == 3)
    // unsupported (xml joined the supported set in round 8)
    intercept[IllegalArgumentException](Sources.file(spark, s"$dir/d.xyz"))
  }

  test("S5 yaml list-of-mappings (common_utils.py:130-134)") {
    val dir = Files.createTempDirectory("graft_yaml").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/d.yaml"),
      "- name: John\n  age: 30\n- name: 'Jane'\n  city: Paris\n")
    val df = Sources.yaml(spark, s"$dir/d.yaml")
    assert(df.count() == 2)
    assert(df.columns.sorted.toSeq == Seq("age", "city", "name"))
    assert(df.where($"name" === "Jane").head().getAs[String]("city") == "Paris")
  }

  test("S6 api envelope unwrap data/results/items (base_extractors.py:255-264)") {
    val body = """{"data": [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]}"""
    val df = Sources.apiBody(spark, body)
    assert(df.count() == 2 && df.columns.sorted.toSeq == Seq("id", "v"))
    val plain = Sources.apiBody(spark, """{"id": 5, "v": "z"}""")
    assert(plain.count() == 1)
    val results = Sources.apiBody(spark, """{"results": [{"x": 1}]}""")
    assert(results.columns.toSeq == Seq("x"))
  }

  test("S7 source validation probe (base_extractors.py:86-94)") {
    assert(Sources.validateSource(Tables.load(spark, sf0001, "region")))
    assert(!Sources.validateSource(spark.read.parquet("/nonexistent/path")))
  }

  test("S8 schema discovery (postgres_connector.py:127-145)") {
    Tables.registerAll(spark, sf0001)
    val tables = Sources.listTables(spark)
    assert(Tables.all.forall(tables.contains))
    val schema = Sources.tableSchema(Tables.load(spark, sf0001, "region"))
    assert(schema == Seq("r_regionkey" -> "int", "r_name" -> "string"))
  }

  test("S9 incremental pulls partition the table: no re-extract, no skip") {
    import org.apache.spark.sql.functions.{col, to_timestamp, lit}
    val ev = Tables.load(spark, sf0001, "events")
    val t1 = to_timestamp(lit("2024-01-16 00:00:00"))
    // pull 1 = source state at bookmark time; pull 2 = strictly past it
    val initial = Sources.incremental(ev, "ts", None).where(col("ts") <= t1)
    val bookmark = Sources.nextBookmark(initial, "ts")
    assert(bookmark.nonEmpty)
    val incr = Sources.incremental(ev, "ts", bookmark.map(lit(_)))
    assert(initial.count() + incr.count() === ev.count())
    assert(initial.intersect(incr).count() === 0)
    // an empty pull keeps the previous bookmark (None from nextBookmark)
    val empty = Sources.incremental(ev, "ts", Some(lit("2099-01-01")))
    assert(Sources.nextBookmark(empty, "ts").isEmpty)
  }

  test("S11 quarantine ingestion: bad lines captured, good lines typed") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_q").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.jsonl"),
      """{"id": 1, "v": "a"}
        |this is not json at all
        |{"id": 2, "v": "b"}
        |{"id": "NOT_A_NUMBER", "v": "c"}
        |{"id": 4, "v": "d"}
        |""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    val (clean, bad) = Sources.jsonWithQuarantine(spark, s"$dir/in.jsonl",
      schema)
    assert(clean.columns.toSeq == Seq("id", "v"))
    assert(clean.orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 4L))
    val raws = bad.collect().map(_.getString(0))
    assert(raws.length == 2)
    assert(raws.exists(_.contains("not json")) &&
      raws.exists(_.contains("NOT_A_NUMBER")))
  }

  test("file manifest: per-file row counts and min/max bounds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fm").toString
    Tables.load(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .repartitionByRange(4, col("o_orderkey"))
      .write.parquet(s"$dir/t")
    val m = graft.sinks.Sinks.fileManifest(spark, s"$dir/t",
      Seq("o_orderkey")).collect()
    assert(m.length == 4)
    val total = Tables.load(spark, sf0001, "orders").count()
    assert(m.map(_.getLong(1)).sum == total)
    // range-partitioned files have DISJOINT key ranges — the skippable
    // layout the manifest exists to audit
    val ranges = m.map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2)
      case _ =>
    }
  }
  test("S1-prod JDBC seam: options compile to the partitioned parallel read (base_extractors.py:47-84)") {
    import graft.sources.JdbcSource
    // plain: url + dbtable + fetchsize only
    val plain = JdbcSource("jdbc:postgresql://db:5432/lake", "public.orders")
    assert(plain.options == Map(
      "url" -> "jdbc:postgresql://db:5432/lake",
      "dbtable" -> "public.orders",
      "fetchsize" -> "10000"))
    // raw WHERE pushes down as a dbtable subquery, evaluated server-side;
    // bare alias (no AS — Oracle rejects AS on table aliases)
    val filtered = plain.copy(where = Some("o_totalprice > 100"))
    assert(filtered.options("dbtable") ==
      "(SELECT * FROM public.orders WHERE o_totalprice > 100) graft_src")
    // table/where are trusted static config; metacharacters are refused
    intercept[IllegalArgumentException] {
      plain.copy(where = Some("1=1; DROP TABLE orders"))
    }
    intercept[IllegalArgumentException] {
      plain.copy(where = Some("o_totalprice > 100 -- comment"))
    }
    intercept[IllegalArgumentException] {
      JdbcSource("jdbc:postgresql://db/lake", "orders/**/WHERE 1=1")
    }
    // full partitioned read: all four partitioning options present
    val parted = JdbcSource("jdbc:postgresql://db:5432/lake", "orders",
      partitionColumn = Some("o_orderkey"), lowerBound = Some(1L),
      upperBound = Some(6000000L), numPartitions = Some(32),
      user = Some("etl"), password = Some("secret"),
      driver = Some("org.postgresql.Driver"))
    val o = parted.options
    assert(o("partitionColumn") == "o_orderkey" && o("lowerBound") == "1"
      && o("upperBound") == "6000000" && o("numPartitions") == "32"
      && o("driver") == "org.postgresql.Driver" && o("user") == "etl")
    // partitioning without bounds is refused, like Spark itself would
    intercept[IllegalArgumentException] {
      JdbcSource("jdbc:x://h/d", "t", partitionColumn = Some("k"))
    }
    intercept[IllegalArgumentException] {
      JdbcSource("postgresql://not-jdbc", "t")
    }
  }

  test("S2-prod Mongo seam: filter dict compiles to the pipeline options (mongo_connector.py:95-116)") {
    import graft.sources.MongoSource
    val plain = MongoSource("mongodb://db:27017", "lake", "events")
    assert(plain.pipelineJson == "[]")
    val o = plain.options
    assert(o("connection.uri") == "mongodb://db:27017"
      && o("database") == "lake" && o("collection") == "events"
      && o("partitioner.options.partition.field") == "_id"
      && o("partitioner.options.partition.size") == "64MB")
    // find(filter).sort(sort).limit(n) -> $match / $sort / $limit, in
    // cursor order; nested operator objects pass through; keys sorted
    val full = plain.copy(
      filterDict = Map("status" -> "active", "value" -> Map("$gte" -> 100),
        "flag" -> true),
      sort = Seq("ts" -> -1, "event_id" -> 1),
      limit = Some(500))
    assert(full.pipelineJson ==
      """[{"$match": {"flag": true, "status": "active", """ +
        """"value": {"$gte": 100}}}, """ +
        """{"$sort": {"ts": -1, "event_id": 1}}, {"$limit": 500}]""")
    // string values are escaped, not interpolated raw
    val quoted = plain.copy(filterDict = Map("name" -> """a"b\c"""))
    assert(quoted.pipelineJson ==
      """[{"$match": {"name": "a\"b\\c"}}]""")
    intercept[IllegalArgumentException] {
      MongoSource("http://not-mongo", "lake", "events")
    }
    intercept[IllegalArgumentException] {
      plain.copy(sort = Seq("ts" -> 2)) // pymongo directions only
    }
  }

  test("S3-prod Influx seam: (measurement, range, fields, tags) compile to Flux (influx_connector.py:142-189)") {
    import graft.sources.InfluxSource
    val s = InfluxSource("http://influx:8086", "graft", "lake", "cpu",
      start = "-1h", stop = "now()",
      fields = Seq("usage_user", "usage_system"),
      tags = Map("host" -> "web-1", "dc" -> "eu"))
    assert(s.flux ==
      """from(bucket: "lake")
        |  |> range(start: -1h, stop: now())
        |  |> filter(fn: (r) => r._measurement == "cpu")
        |  |> filter(fn: (r) => r._field == "usage_user" or r._field == "usage_system")
        |  |> filter(fn: (r) => r.dc == "eu")
        |  |> filter(fn: (r) => r.host == "web-1")""".stripMargin)
    // ISO bounds wrap in time(v: "..."); bare relative/now() pass through
    val iso = s.copy(start = "2024-01-01 00:00:00", stop = "2024-02-01")
    assert(iso.flux.contains(
      """range(start: time(v: "2024-01-01T00:00:00"), """ +
        """stop: time(v: "2024-02-01"))"""))
    // long-format schema contract: fixed columns + sorted tag columns —
    // the exact shape Sources.toWide pivots
    assert(s.resultSchema.fieldNames.toSeq ==
      Seq("time", "measurement", "field", "value", "dc", "host"))
    intercept[IllegalArgumentException] {
      s.copy(start = "yesterday")
    }
    intercept[IllegalArgumentException] {
      s.copy(measurement = "cpu\" or true") // Flux metacharacters
    }
    // tag keys interpolate BARE (r.$k): a quote-free key that rewrites
    // the filter must be refused by the identifier check, not slip past
    // the metacharacter one
    intercept[IllegalArgumentException] {
      s.copy(tags = Map("host == r._field or r.x" -> "web-1"))
    }
    intercept[IllegalArgumentException] {
      s.copy(tags = Map("1host" -> "web-1")) // not an identifier
    }
    intercept[IllegalArgumentException] {
      InfluxSource("ftp://x", "o", "b", "m")
    }
  }

  test("S1-prod LIVE: embedded-Derby JDBC write -> partitioned read through the seam") {
    import graft.sources.JdbcSource
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val url = "jdbc:derby:memory:graft_spec;create=true"
    val drv = "org.apache.derby.jdbc.EmbeddedDriver"
    val src = Tables.load(spark, sf0001, "customer")
      .filter(col("c_custkey") < 500)
      .select(col("c_custkey").as("C_CUSTKEY"),
        col("c_acctbal").as("C_ACCTBAL"))
    src.write.format("jdbc").option("url", url)
      .option("dbtable", "CUST").option("driver", drv)
      .mode("overwrite").save()
    val jd = JdbcSource(url, "CUST", where = Some("C_CUSTKEY >= 10"),
      partitionColumn = Some("C_CUSTKEY"), lowerBound = Some(0L),
      upperBound = Some(500L), numPartitions = Some(4),
      driver = Some(drv))
    val back = jd.load(spark)
    // the read is genuinely PARTITIONED: 4 concurrent range queries
    assert(back.rdd.getNumPartitions == 4)
    // values survive the wire both ways, WHERE applied server-side
    val expect = Tables.load(spark, sf0001, "customer")
      .filter(col("c_custkey") >= 10 && col("c_custkey") < 500)
    assert(back.count() == expect.count())
    val sumBack = back.agg(sum(col("C_ACCTBAL"))).head().getDouble(0)
    val sumExp = expect.agg(sum(col("c_acctbal"))).head().getDouble(0)
    assert(math.abs(sumBack - sumExp) < 1e-6)
    // overwrite mode is idempotent (bench reruns rewrite the table)
    src.write.format("jdbc").option("url", url)
      .option("dbtable", "CUST").option("driver", drv)
      .mode("overwrite").save()
    assert(jd.load(spark).count() == expect.count())
  }

  test("S1-prod JDBC pagination -> partition math (fetch_size loop becomes numPartitions)") {
    import graft.sources.JdbcSource
    // 6M keys at 50k per page = 120 pages -> capped at 64 partitions
    val j = JdbcSource.fromPagination("jdbc:postgresql://db/lake",
      "orders", "o_orderkey", pageSize = 50000, lower = 1,
      upper = 6000000)
    assert(j.options("numPartitions") == "64"
      && j.options("fetchsize") == "50000"
      && j.options("lowerBound") == "1"
      && j.options("upperBound") == "6000000")
    // small span: exact page count, no cap
    val small = JdbcSource.fromPagination("jdbc:h2:mem:t", "t", "id",
      pageSize = 100, lower = 0, upper = 999)
    assert(small.options("numPartitions") == "10")
    // one short page still reads
    val one = JdbcSource.fromPagination("jdbc:h2:mem:t", "t", "id",
      pageSize = 1000, lower = 5, upper = 7)
    assert(one.options("numPartitions") == "1")
    intercept[IllegalArgumentException] {
      JdbcSource.fromPagination("jdbc:h2:mem:t", "t", "id", 0, 1, 2)
    }
  }
}
