package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.SpaceSavingTopK

/** Semantics of the native mergeable SpaceSaving aggregate
  * ([[org.apache.spark.sql.graftx.SpaceSavingTopK]]): exact when
  * distinct ≤ capacity regardless of partitioning, the classic
  * overestimate-by-≤-err guarantee when over capacity, SQL-registered,
  * and guarded. */
class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  private def items(pairs: (String, Int)*): Seq[String] =
    pairs.flatMap { case (it, n) => Seq.fill(n)(it) }

  test("exact regime: equals groupBy count, err 0, any partitioning") {
    val data = items("a" -> 50, "b" -> 30, "c" -> 20, "d" -> 5)
    for (parts <- Seq(1, 4, 8)) {
      val df = data.toDF("item").repartition(parts)
      val out = df.agg(SpaceSavingTopK.topk($"item", 10, 4).as("t"))
        .select(explode($"t").as("e"))
        .select($"e.item", $"e.cnt", $"e.err")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(out.toSeq ===
        Seq(("a", 50L, 0L), ("b", 30L, 0L), ("c", 20L, 0L), ("d", 5L, 0L)),
        s"parts=$parts")
    }
  }

  test("ties order by item asc at equal counts") {
    val df = items("z" -> 3, "a" -> 3, "m" -> 3).toDF("item")
    val out = df.agg(SpaceSavingTopK.topk($"item", 10, 3).as("t"))
      .select(explode($"t.item").as("i")).as[String].collect()
    assert(out.toSeq === Seq("a", "m", "z"))
  }

  test("overflow regime: guarantee cnt-err <= true <= cnt, heavy survives") {
    // 1000 rows, one dominant item, 50 distinct tail items, capacity 8:
    // any item with true frequency > n/capacity = 125 must be reported.
    val tail = (0 until 50).flatMap(i => Seq.fill(10)(f"t$i%02d"))
    val data = items("heavy" -> 500) ++ tail // n = 1000
    val trueCnt = (Map("heavy" -> 500) ++
      (0 until 50).map(i => f"t$i%02d" -> 10)).map { case (k, v) =>
      (k, v.toLong) }
    val out = data.toDF("item").repartition(4)
      .agg(SpaceSavingTopK.topk($"item", 8, 8).as("t"))
      .select(explode($"t").as("e"))
      .select($"e.item", $"e.cnt", $"e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.exists(_._1 == "heavy"), "frequent item must be present")
    out.foreach { case (it, cnt, err) =>
      val t = trueCnt(it)
      assert(cnt >= t, s"$it: count $cnt must overestimate true $t")
      assert(cnt - err <= t, s"$it: cnt-err ${cnt - err} must not exceed $t")
    }
    val heavy = out.find(_._1 == "heavy").get
    assert(heavy._2 >= 500L && heavy._2 - heavy._3 <= 500L)
  }

  test("grouped + SQL registration path") {
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"),
      ("g2", "z")).toDF("g", "item")
    df.createOrReplaceTempView("ss_in")
    val out = spark.sql(
      """SELECT g, space_saving_topk(item, 100, 1) AS t
        |FROM ss_in GROUP BY g ORDER BY g""".stripMargin)
      .select($"g", $"t"(0).getField("item").as("top"),
        $"t"(0).getField("cnt").as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("g1", "x", 2L), ("g2", "z", 1L)))
  }

  test("nulls skipped; guards reject bad capacity/k") {
    val df = Seq(Some("a"), None, Some("a")).toDF("item")
    val out = df.agg(SpaceSavingTopK.topk($"item", 4, 4).as("t"))
      .select(explode($"t").as("e")).select($"e.item", $"e.cnt")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("a", 2L)))
    intercept[IllegalArgumentException] {
      SpaceSavingTopK.topk($"item", 4, 5) // k > capacity
    }
    intercept[IllegalArgumentException] {
      SpaceSavingTopK.topk($"item", 0, 0)
    }
  }

  test("distinct == capacity stays EXACT and partition-order independent") {
    import org.apache.spark.sql.graftx.SpaceSavingBuffer
    // both summaries FULL (size == capacity) but never evicted (all
    // errs 0): a full-but-clean summary provably tracks everything it
    // ever saw, so an absent item truly has count 0 — the merge must
    // stay purely additive, in BOTH orders
    def buf(items: String*): SpaceSavingBuffer = {
      val b = new SpaceSavingBuffer(2)
      items.foreach(b.add)
      b
    }
    val ab = buf("a", "a", "b")     // full: {a:2, b:1}, errs 0
    ab.merge(buf("c", "d"))         // full: {c:1, d:1}, errs 0
    val dc = buf("c", "d")
    dc.merge(buf("a", "a", "b"))
    // additive truth: a=2, b=c=d=1; capacity 2 keeps (cnt desc, item
    // asc) => {a:2, b:1} from either merge order, all errs still 0
    for (m <- Seq(ab, dc)) {
      assert(m.entries.size == 2)
      assert(m.entries("a") === ((2L, 0L)),
        s"exact regime inflated: ${m.entries}")
      assert(m.entries("b") === ((1L, 0L)),
        s"tie must keep smallest item exactly: ${m.entries}")
    }
    // the exact DataFrame path at the boundary: exactly `capacity`
    // distinct items, spread over partitions
    val data = items("a" -> 5, "b" -> 3, "c" -> 2, "d" -> 1)
    for (parts <- Seq(1, 4, 8)) {
      val out = data.toDF("item").repartition(parts)
        .agg(SpaceSavingTopK.topk($"item", 4, 4).as("t"))
        .select(explode($"t").as("e"))
        .select($"e.item", $"e.cnt", $"e.err")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(out.toSeq === Seq(("a", 5L, 0L), ("b", 3L, 0L),
        ("c", 2L, 0L), ("d", 1L, 0L)), s"parts=$parts")
    }
  }

  test("merge credits items absent from a FULL summary (no underestimate)") {
    import org.apache.spark.sql.graftx.SpaceSavingBuffer
    // partition A (capacity 2) sees zz,zz,a,b,c - zz evicted along the
    // way; partition B sees zz once. A naive additive merge would
    // report zz with cnt=1 < true=3; the mergeable-summaries credit
    // (absent side's min counter) must keep cnt >= true for EVERY item.
    val trueCounts = Map("zz" -> 3L, "a" -> 1L, "b" -> 1L, "c" -> 1L)
    val bufA = new SpaceSavingBuffer(2)
    Seq("zz", "zz", "a", "b", "c").foreach(bufA.add)
    val bufB = new SpaceSavingBuffer(2)
    bufB.add("zz")
    bufA.merge(bufB)
    assert(bufA.entries.nonEmpty && bufA.entries.size <= 2)
    bufA.entries.foreach { case (it, (c, e)) =>
      val t = trueCounts(it)
      assert(c >= t, s"$it: merged cnt $c underestimates true $t")
      assert(c - e <= t, s"$it: certified floor ${c - e} exceeds true $t")
    }
    // exact regime unaffected: neither side full => purely additive
    val x = new SpaceSavingBuffer(10); Seq("p", "p", "q").foreach(x.add)
    val y = new SpaceSavingBuffer(10); Seq("p", "r").foreach(y.add)
    x.merge(y)
    assert(x.entries("p") === ((3L, 0L)))
    assert(x.entries("q") === ((1L, 0L)))
    assert(x.entries("r") === ((1L, 0L)))
  }

  test("merge-trim loss is tracked: 3-way merge keeps cnt >= true") {
    import org.apache.spark.sql.graftx.SpaceSavingBuffer
    // The unsound shape: two full-but-never-evicted summaries (all errs
    // 0) with disjoint items merge additively then TRIM — dropping b and
    // d without stamping any err. Inferring "lossless" from errs==0
    // would then credit a third partial's b nothing, reporting
    // b=(2, err 0) when true=3 — an underestimate with a certified-
    // exact error bar. The explicit lossy flag (set by the trim) must
    // make the third merge credit b the min counter instead.
    val m = new SpaceSavingBuffer(2)
    Seq("a", "a", "b").foreach(m.add)          // {a:2, b:1}, errs 0
    val p2 = new SpaceSavingBuffer(2)
    Seq("c", "c", "c", "d").foreach(p2.add)    // {c:3, d:1}, errs 0
    m.merge(p2)                                // trim drops b, d -> lossy
    assert(m.lossy, "merge-trim must mark the summary lossy")
    assert(m.entries.forall(_._2._2 == 0L), "trim does not stamp err")
    val p3 = new SpaceSavingBuffer(2)
    Seq("b", "b").foreach(p3.add)              // {b:2}, clean
    m.merge(p3)
    val trueCounts = Map("a" -> 2L, "b" -> 3L, "c" -> 3L, "d" -> 1L)
    m.entries.foreach { case (it, (c, e)) =>
      val t = trueCounts(it)
      assert(c >= t, s"$it: merged cnt $c underestimates true $t")
      assert(c - e <= t, s"$it: certified floor ${c - e} exceeds true $t")
    }
    // an evicted-then-merged-in lossy peer also taints the accumulator,
    // even when the accumulator itself never trims
    val clean = new SpaceSavingBuffer(4)
    clean.add("x")
    val evicted = new SpaceSavingBuffer(2)
    Seq("p", "q", "r").foreach(evicted.add)    // r evicts the min
    assert(evicted.lossy)
    clean.merge(evicted)
    assert(clean.lossy, "lossy peer must propagate through merge")
  }

  test("property: random merge trees keep cnt-err <= true <= cnt") {
    import org.apache.spark.sql.graftx.SpaceSavingBuffer
    // 200 random trials: a Zipf-ish stream over a small alphabet is
    // split into random chunks, each chunk streams into its own
    // capacity-4 summary (distinct items exceed capacity, so buffers
    // genuinely evict), and the partials merge in a RANDOM binary tree
    // — the shape Spark's partial/final aggregation and AQE coalescing
    // can produce. Every reported item must satisfy the certified
    // bracket, and every ABSENT item's true count must be <= the
    // summary's implied bound (no silent loss).
    val rng = new scala.util.Random(19L)
    for (trial <- 0 until 200) {
      val items = (0 until 300).map { _ =>
        ('a' + (math.sqrt(rng.nextInt(144)).toInt % 12)).toChar.toString
      }
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // random chunking into 1..8 partials
      val nChunks = 1 + rng.nextInt(8)
      val bounds = (Seq(0, items.size) ++
        Seq.fill(nChunks - 1)(rng.nextInt(items.size + 1))).sorted
      var bufs = bounds.zip(bounds.tail).map { case (lo, hi) =>
        val b = new SpaceSavingBuffer(4)
        items.slice(lo, hi).foreach(b.add)
        b
      }.toVector
      // random merge tree
      while (bufs.size > 1) {
        val i = rng.nextInt(bufs.size)
        val j0 = rng.nextInt(bufs.size - 1)
        val j = if (j0 >= i) j0 + 1 else j0
        bufs(i).merge(bufs(j))
        bufs = bufs.patch(j, Nil, 1)
      }
      val m = bufs.head
      m.entries.foreach { case (it, (c, e)) =>
        val t = truth.getOrElse(it, 0L)
        assert(c >= t, s"trial $trial: $it cnt $c < true $t")
        assert(c - e <= t, s"trial $trial: $it floor ${c - e} > true $t")
      }
      // absent items: with the lossy flag the min counter bounds them
      val bound =
        if (m.lossy) m.entries.values.map(_._1).min else 0L
      truth.keys.filterNot(m.entries.contains).foreach { it =>
        assert(truth(it) <= bound,
          s"trial $trial: absent $it true ${truth(it)} exceeds bound $bound")
      }
    }
  }

  test("lossy flag survives serialization") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graftx.{SpaceSavingBuffer, SpaceSavingTopK}
    val agg = SpaceSavingTopK(Literal("x"), 2, 2)
    val b = new SpaceSavingBuffer(2)
    Seq("a", "b", "c").foreach(b.add)          // eviction -> lossy
    assert(b.lossy)
    val rt = agg.deserialize(agg.serialize(b))
    assert(rt.lossy, "shuffle round-trip must preserve loss accounting")
    assert(rt.entries === b.entries)
    val cleanRt = agg.deserialize(agg.serialize(new SpaceSavingBuffer(2)))
    assert(!cleanRt.lossy)
  }
}
