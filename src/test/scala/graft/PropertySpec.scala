package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.transform.{Cleaning, Stamp}
import graft.functions.scalars._

/** Property tests (SURVEY.md §5 item 3): idempotence and robustness of
  * cleaning/normalization over scalacheck-generated inputs (seeded
  * sampling — the scalatest/scalacheck bridge isn't in the offline
  * cache, so generators are driven directly). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long = 42L): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val messyString: Gen[String] = for {
    core <- Gen.alphaNumStr.map(_.take(12))
    pre <- Gen.oneOf("", " ", "  ", "\t")
    post <- Gen.oneOf("", " ", "  ")
  } yield pre + core + post

  test("cleaning is idempotent: clean(clean(x)) == clean(x)") {
    val xs = samples(messyString, 40)
    val df = xs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "name")
    val c = Cleaning(stamp = Stamp.off)
    val once = c(df).orderBy("id").collect().toSeq
    val twice = c(c(df)).orderBy("id").collect().toSeq
    assert(once == twice)
  }

  test("phone normalizer: 10-digit inputs always format, digits preserved") {
    val tenDigits = Gen.listOfN(10, Gen.numChar).map(_.mkString)
    val out = samples(tenDigits, 50).toDF("phone")
      .select(normalizePhone(col("phone")).as("p"), col("phone"))
      .collect()
    out.foreach { r =>
      val p = r.getString(0)
      assert(p.matches("\\(\\d{3}\\) \\d{3}-\\d{4}"), p)
      assert(p.replaceAll("\\D", "") == r.getString(1))
    }
  }

  test("phone normalizer is idempotent on its own output") {
    val tenDigits = Gen.listOfN(10, Gen.numChar).map(_.mkString)
    val once = samples(tenDigits, 30).toDF("p")
      .select(normalizePhone(col("p")).as("p"))
    val twice = once.select(normalizePhone(col("p")).as("p"))
    assert(once.as[String].collect().toSeq ==
      twice.as[String].collect().toSeq)
  }

  test("multi-format date parse round-trips ISO and slash dates") {
    val dates: Gen[(String, String)] = for {
      y <- Gen.choose(1990, 2030); m <- Gen.choose(1, 12)
      d <- Gen.choose(1, 28)
      iso = f"$y%04d-$m%02d-$d%02d"
      variant <- Gen.oneOf(iso, f"$y%04d/$m%02d/$d%02d",
        f"$iso 10:30:00", f"${iso}T10:30:00")
    } yield (variant, iso)
    val rows = samples(dates, 60)
    val parsed = rows.toDF("s", "iso")
      .select(col("iso"), date_format(parseDateMulti(col("s")),
        "yyyy-MM-dd").as("rt")).collect()
    parsed.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("exact dedup is idempotent; survivor count = distinct texts") {
    val doc = Gen.oneOf("aaa", "bbb", "ccc", "ddd")
    val xs = samples(doc, 40)
    val df = xs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "text")
    val d1 = graft.dedup.Dedup.exactDedup(df, "text", "doc_id")
    val d2 = graft.dedup.Dedup.exactDedup(d1, "text", "doc_id")
    assert(d1.orderBy("doc_id").collect().toSeq ==
      d2.orderBy("doc_id").collect().toSeq)
    assert(d1.count() == xs.distinct.size)
  }

  test("record hash: stable under key permutation (sorted-key json form)") {
    val xs = samples(messyString, 20)
    val df = xs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("k2", "k1")
    val h1 = df.select(recordHashJson(df, Seq("k1", "k2")).as("h"))
    val h2 = df.select(recordHashJson(df, Seq("k2", "k1")).as("h"))
    assert(h1.as[String].collect().toSeq == h2.as[String].collect().toSeq)
  }

  test("unaccent: idempotent, length never grows, ASCII fixed-point") {
    import org.apache.spark.sql.graftx.Unaccent
    val accented = Gen.listOfN(12, Gen.oneOf(
      ('a' to 'z') ++ "áéíóúàèìòùâêîôûäëïöüñçåøÁÉÍÑÜ ".toSeq)).map(_.mkString)
    samples(accented, 80).foreach { s =>
      val once = Unaccent.strip(s)
      assert(Unaccent.strip(once) === once, s"not idempotent on '$s'")
      assert(once.length <= s.length)
    }
    val ascii = samples(Gen.asciiPrintableStr.map(_.take(20)), 40)
    ascii.foreach(s => assert(Unaccent.strip(s) === s))
  }

  test("chunking reconstructs the document for arbitrary window/stride") {
    // de-overlapped chunk concatenation must equal the original token
    // stream for ANY 0 < stride <= window: chunk 0 contributes all its
    // tokens, every later chunk contributes the tokens past the
    // (window - stride)-token overlap with its predecessor
    val cases = for {
      (window, stride) <- Seq((8, 8), (8, 5), (16, 3), (5, 1), (32, 24))
      nTokens <- Seq(1, 4, 7, 31, 100)
    } yield (window, stride, nTokens)
    cases.foreach { case (window, stride, nTokens) =>
      val toks = (1 to nTokens).map(i => s"w$i")
      val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val chunks = graft.text.TextAnalysis
        .chunkTokens(df, "text", "doc_id", window, stride)
        .orderBy("chunk_id").collect()
        .map(_.getString(3).split(" ").toSeq)
      val rebuilt = chunks.head ++ chunks.tail.flatMap { c =>
        // a successor starts stride tokens after its predecessor; if the
        // predecessor was full-width the overlap is window - stride
        c.drop(math.min(c.length, window - stride))
      }
      // tail chunks shorter than the overlap add nothing new — drop dups
      assert(rebuilt.distinct == toks,
        s"window=$window stride=$stride n=$nTokens")
    }
  }

  test("salted join equals plain join for arbitrary bucket counts") {
    val fact = Seq.tabulate(200)(i => ((i % 7).toLong, i.toDouble))
      .toDF("k", "v")
    val dim = Seq.tabulate(7)(i => (i.toLong, s"d$i")).toDF("k", "name")
    Seq(1, 2, 5, 16).foreach { b =>
      val salted = graft.plans.Scale.saltedJoin(fact, dim, "k", b)
        .groupBy($"name").agg(count(lit(1)).as("n"), sum($"v").as("s"))
        .orderBy($"name").collect().toSeq
      val plain = fact.join(dim, Seq("k"))
        .groupBy($"name").agg(count(lit(1)).as("n"), sum($"v").as("s"))
        .orderBy($"name").collect().toSeq
      assert(salted === plain, s"bucket count $b diverged")
    }
  }

  test("coercion: long-regex accepts exactly what parses (generated ints + garbage)") {
    val mixed = Gen.oneOf(
      Gen.choose(Long.MinValue / 2, Long.MaxValue / 2).map(_.toString),
      Gen.alphaStr.map(_.take(8)),
      Gen.choose(-1e9, 1e9).map(_.toString))
    val xs = samples(mixed, 60)
    val out = xs.toDF("s")
      .select(col("s"), coerceLong(col("s")).as("l")).collect()
    out.foreach { r =>
      val expected = scala.util.Try(r.getString(0).trim.toLong).toOption
      val got = if (r.isNullAt(1)) None else Some(r.getLong(1))
      assert(got == expected, s"input=${r.getString(0)}")
    }
  }

  test("scd2: generated change logs tile each key's timeline; " +
      "replaying the history reproduces it") {
    import java.sql.Timestamp
    val logGen: Gen[List[(Long, Int, String)]] = Gen.listOfN(60, for {
      k <- Gen.choose(1L, 5L)
      t <- Gen.choose(1, 50)
      s <- Gen.oneOf("A", "B", "C")
    } yield (k, t, s))
    samples(logGen, 8).zipWithIndex.foreach { case (rows, i) =>
      // unique (key, ts): duplicate instants have engine-arbitrary
      // intra-tie states; the tie column only fixes the ORDER
      val log = rows.distinctBy(r => (r._1, r._2)).zipWithIndex
        .map { case ((k, t, s), id) =>
          (k, new Timestamp(t * 86400000L), id.toLong, s)
        }.toDF("k", "ts", "id", "state")
      val hist = graft.operators.Scd2
        .fromChangeLog(log, "k", "ts", "id", Seq("state"))
        .select($"k", $"version", $"state", $"valid_from", $"valid_to")
        .cache()
      // ranges tile: next valid_from == valid_to, exactly 1 open row/key
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"k").orderBy($"version")
      assert(hist.withColumn("nf", lead($"valid_from", 1).over(w))
        .filter($"nf".isNotNull && !($"valid_to" <=> $"nf"))
        .count() === 0, s"sample $i: gap/overlap")
      // replay: running Scd2 over its own change rows is a fixpoint
      val replay = graft.operators.Scd2.fromChangeLog(
          hist.select($"k", $"valid_from".as("ts"),
            $"version".cast("long").as("id"), $"state"),
          "k", "ts", "id", Seq("state"))
        .select($"k", $"version", $"state", $"valid_from", $"valid_to")
      assert(replay.exceptAll(hist).count() === 0 &&
        hist.exceptAll(replay).count() === 0, s"sample $i: not a fixpoint")
      hist.unpersist()
    }
  }

  test("z-order key is injective on bucket tuples and preserves " +
      "per-dimension bucket order on axis-aligned lines") {
    val ptsGen: Gen[List[(Long, Long)]] = Gen.listOfN(80, for {
      x <- Gen.choose(0L, 1023L); y <- Gen.choose(0L, 1023L)
    } yield (x, y))
    samples(ptsGen, 4).foreach { pts =>
      val df = pts.distinct.toDF("x", "y")
      val z = graft.sinks.ZOrder.zvalue(df, Seq("x", "y"), bits = 10)
      val out = df.select($"x", $"y", z.as("z")).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      // injective: distinct points -> distinct z (10 bits cover 0..1023
      // exactly, so buckets are the coordinates themselves)
      assert(out.values.toSeq.distinct.size === out.size)
      // along any axis-aligned line, z is monotone in the free coord
      out.keys.groupBy(_._1).values.filter(_.size > 1).foreach { line =>
        val sorted = line.toSeq.sortBy(_._2)
        assert(sorted.map(out) == sorted.map(out).sorted,
          s"z not monotone along x-line $sorted")
      }
    }
  }

  test("assignSplit: partition property — every key in exactly one band, " +
    "invariant under corpus composition") {
    val keys = samples(Gen.chooseNum(Long.MinValue, Long.MaxValue), 60)
      .distinct
    val df = keys.map(k => Tuple1(k)).toDF("k")
    val splits = Seq("a" -> 50, "b" -> 30, "c" -> 20)
    val full = graft.curation.Curation.assignSplit(df, "k", "ps", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(full.keySet == keys.toSet) // total: nothing dropped/duplicated
    assert(full.values.toSet.subsetOf(Set("a", "b", "c")))
    // membership depends only on the key: any sub-corpus agrees
    val sub = graft.curation.Curation.assignSplit(
        df.filter($"k" % 2 === 0), "k", "ps", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    sub.foreach { case (k, s) => assert(full(k) == s) }
  }

  test("groupedTopK equals the window form for generated skewed data") {
    import org.apache.spark.sql.expressions.Window
    val rows = samples(for {
      g <- Gen.oneOf("g1", "g2", "g3")
      v <- Gen.chooseNum(-1000, 1000)
      id <- Gen.chooseNum(0L, 100000L)
    } yield (g, v, id), 120)
    Seq(1, 3, 7).foreach { k =>
      val df = rows.toDF("g", "v", "id").distinct()
      val want = df.withColumn("rank", row_number().over(
          Window.partitionBy($"g").orderBy($"v".desc, $"id".asc)))
        .filter($"rank" <= k).orderBy($"g", $"rank").collect().toSeq
      val got = graft.plans.Scale.groupedTopK(df, Seq("g"),
          Seq($"v".desc, $"id".asc), k, saltBuckets = 5)
        .orderBy($"g", $"rank").collect().toSeq
      assert(got == want, s"k=$k")
    }
  }

  test("gap fill: spine complete, present cells untouched, carry monotone") {
    val days = (1 to 9).map(d => f"2024-02-0$d%d")
    val cells = samples(for {
      d <- Gen.oneOf(days)
      k <- Gen.oneOf("a", "b", "c")
      n <- Gen.chooseNum(1L, 50L)
      v <- Gen.chooseNum(1.0, 9.0)
    } yield (d, k, n, v), 25).distinctBy(c => (c._1, c._2))
    val daily = cells.toDF("day", "k", "n", "v")
    val filled = graft.operators.GapFill.fillDaily(daily, "day", "k",
      days.head, days.last, Seq("n"), Seq("v")).collect()
    val keys = cells.map(_._2).distinct
    assert(filled.length == days.length * keys.length) // complete grid
    val present = cells.map(c => (c._1, c._2) -> (c._3, c._4)).toMap
    val lastSeen = scala.collection.mutable.Map.empty[String, Double]
    filled.sortBy(r => (r.getString(1), r.getString(0))).foreach { r =>
      val (day, k) = (r.getString(0), r.getString(1))
      present.get((day, k)) match {
        case Some((n, v)) => // present cells pass through untouched
          assert(r.getLong(2) == n && r.getDouble(3) == v)
          lastSeen(k) = v
        case None => // absent: zero count, carried (or null) value
          assert(r.getLong(2) == 0L)
          lastSeen.get(k) match {
            case Some(v) => assert(r.getDouble(3) == v)
            case None => assert(r.isNullAt(3))
          }
      }
    }
  }

  test("bloom reduction ≡ plain join for arbitrary dim selectivities") {
    val li = Tables.load(spark, sf0001, "lineitem")
    samples(Gen.chooseNum(-900.0, 9500.0), 4, seed = 99L).foreach { thr =>
      val dim = Tables.load(spark, sf0001, "supplier")
        .filter(col("s_acctbal") > thr)
      val viaBloom = graft.operators.BloomReduce
        .bloomReducedJoin(li, col("l_suppkey"), dim, "s_suppkey")
        .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n"))
      val plain = li.join(dim, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n"))
      assert(viaBloom.exceptAll(plain).union(plain.exceptAll(viaBloom))
        .count() === 0L, s"bloom join diverged at threshold $thr")
    }
  }

  test("stats-pruned read ≡ full filter for arbitrary key ranges") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_skip_prop").toString + "/t"
    graft.sources.StatsSkipping.writeClustered(
      Tables.load(spark, sf0001, "lineitem"), path, "l_orderkey",
      nFiles = 8, manifestCols = Seq("l_orderkey"))
    val ranges = samples(Gen.chooseNum(-100L, 1600L), 8, seed = 5L)
      .grouped(2).map(p => (p.min, p.max)).toSeq
    ranges.foreach { case (lo, hi) =>
      val pruned = graft.sources.StatsSkipping
        .prunedRead(spark, path, "l_orderkey", lo, hi)
      val full = spark.read.parquet(path)
        .filter(col("l_orderkey") >= lo && col("l_orderkey") <= hi)
      assert(pruned.count() === full.count(),
        s"pruned read lost rows on [$lo, $hi]")
    }
  }

  test("int8 quantization: reconstruction error bounded by qscale/2 per element") {
    val vecs = (0 until 30).map { i =>
      (i.toLong, samples(Gen.chooseNum(-10.0f, 10.0f), 16, seed = 7L + i)
        .toArray)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val q = graft.similarity.Ann.quantizeInt8(df, "embedding")
    val rows = q.select($"embedding", $"qscale",
      graft.similarity.Ann.dequantizeInt8($"qvec", $"qscale").as("deq"))
      .collect()
    rows.foreach { r =>
      val orig = r.getSeq[Float](0)
      val scale = r.getDouble(1)
      val deq = r.getSeq[Double](2)
      orig.zip(deq).foreach { case (o, d) =>
        // round() puts each element within half a quantization step
        assert(math.abs(o - d) <= scale / 2 + 1e-9,
          s"|$o - $d| > ${scale / 2}")
      }
    }
  }

  test("unrestricted DL equals BFS over the 4-op edit graph (short strings)") {
    import org.apache.spark.sql.graftx.DamerauLevenshtein
    // independent ground truth: breadth-first search over the literal
    // edit graph (insert/delete/substitute/adjacent-transpose on the
    // CURRENT string state) — the definition, not the DP
    def bfs(a: String, b: String, cap: Int): Option[Int] = {
      if (a == b) return Some(0)
      val alphabet = (a + b).toSet.toSeq
      var frontier = Set(a)
      val seen = collection.mutable.Set(a)
      for (d <- 1 to cap) {
        val next = collection.mutable.Set.empty[String]
        for (s <- frontier) {
          val edits = collection.mutable.Buffer.empty[String]
          for (i <- 0 to s.length; c <- alphabet)
            edits += s.substring(0, i) + c + s.substring(i)    // insert
          for (i <- 0 until s.length)
            edits += s.substring(0, i) + s.substring(i + 1)    // delete
          for (i <- 0 until s.length; c <- alphabet if c != s(i))
            edits += s.substring(0, i) + c + s.substring(i + 1) // subst
          for (i <- 0 until s.length - 1)
            edits += s.substring(0, i) + s(i + 1) + s(i) +
              s.substring(i + 2)                               // transpose
          for (e <- edits if !seen(e)) {
            if (e == b) return Some(d)
            if (math.abs(e.length - b.length) <= cap - d) {
              seen += e; next += e
            }
          }
        }
        frontier = next.toSet
        if (frontier.isEmpty) return None
      }
      None
    }
    val gen = for {
      n <- Gen.choose(0, 5)
      m <- Gen.choose(0, 5)
      x <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
      y <- Gen.listOfN(m, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    } yield (x, y)
    var checked = 0
    samples(gen, 120, seed = 7L).foreach { case (x, y) =>
      bfs(x, y, 3).foreach { d =>
        assert(DamerauLevenshtein.distance(x, y) === d,
          s"dl('$x','$y')"); checked += 1
      }
    }
    assert(checked >= 60, s"property exercised only $checked pairs")
  }

  test("error isolation ≡ the per-record try/except reference, any failure pattern") {
    import graft.transform.{ErrorIsolation, IsolatedStage}
    // random per-row failure masks over 3 stages; the oracle is a
    // direct Scala transcription of the Python loop
    // (data_transformers.py:297-311): each stage either applies its
    // outputs or appends its error and leaves the record untouched
    val rows = samples(for {
      a <- Gen.choose(0L, 60L)
      f1 <- Gen.oneOf(true, false)
      f2 <- Gen.oneOf(true, false)
      f3 <- Gen.oneOf(true, false)
    } yield (a, f1, f2, f3), 80, seed = 7L)
      .zipWithIndex.map { case ((a, f1, f2, f3), i) =>
        (i.toLong, a, f1, f2, f3) }
    val df = rows.toDF("id", "a", "f1", "f2", "f3")
    val stages = Seq(
      IsolatedStage("S1", lit("e1"), fails = col("f1"),
        outputs = Map("a" -> (col("a") + 100L))),
      IsolatedStage("S2", lit("e2"), fails = col("f2"),
        outputs = Map("b" -> (col("a") * 2L))), // reads post-S1 a
      IsolatedStage("S3", lit("e3"), fails = col("f3"),
        outputs = Map("a" -> (col("a") - 7L), "c" -> col("b"))))
    val got = ErrorIsolation.run(df, stages).orderBy("id").collect()
      .map(r => (r.getLong(0),
        r.getLong(r.fieldIndex("a")),
        if (r.isNullAt(r.fieldIndex("b"))) None else Some(r.getLong(r.fieldIndex("b"))),
        if (r.isNullAt(r.fieldIndex("c"))) None else Some(r.getLong(r.fieldIndex("c"))),
        r.getSeq[String](r.fieldIndex("_transformation_errors")).toList))
    val expect = rows.map { case (id, a0, f1, f2, f3) =>
      var a = a0; var b: Option[Long] = None; var c: Option[Long] = None
      var errs = List.empty[String]
      if (f1) errs :+= "S1: e1" else a += 100L
      if (f2) errs :+= "S2: e2" else b = Some(a * 2L)
      if (f3) errs :+= "S3: e3" else { c = b; a -= 7L }
      (id, a, b, c, errs)
    }.sortBy(_._1)
    assert(got.toSeq == expect)
    // invariant: rows never drop, regardless of failure pattern
    assert(got.length == rows.length)
  }
}
