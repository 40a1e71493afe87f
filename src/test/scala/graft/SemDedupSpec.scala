package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.dedup.SemDedup

/** Property tests for SemDeDup-style semantic dedup: the distributed
  * pipeline (broadcast argmax assignment, per-cluster window scan)
  * must equal a brute-force in-memory reference on arbitrary random
  * corpora — the assignment tie-break, keeper rule, and window
  * semantics are the fixed points; join/window plans are freedom. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seed + i)))

  /** Spark `round(_, 6)` replica (HALF_UP on the double's decimal). */
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Same accumulation order as the codegen CosineSimilarity loop. */
  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Brute-force reference: id → (cluster, rk, cent_cos, dup). */
  private def ref(vecs: Seq[(Long, Seq[Double])],
      cents: Seq[(Long, Seq[Double])], w: Int, tau: Double)
      : Map[Long, (Long, Long, Double, Int)] = {
    val assigned = vecs.map { case (id, v) =>
      val (cc, cid) = cents.map { case (cid, cv) => (r6(cos(v, cv)), cid) }
        .maxBy { case (c, cid) => (c, -cid) } // max cosine, ties → min cid
      (id, v, cid, cc)
    }
    assigned.groupBy(_._3).flatMap { case (cl, ms) =>
      val ordered = ms.sortBy { case (id, _, _, cc) => (-cc, id) }
      ordered.zipWithIndex.map { case ((id, v, _, cc), idx) =>
        val prev = ordered.slice(math.max(0, idx - w), idx)
        val dup = prev.exists { case (_, pv, _, _) => r6(cos(pv, v)) >= tau }
        id -> ((cl, (idx + 1).toLong, cc, if (dup) 1 else 0))
      }
    }.toMap
  }

  // random corpus: small-integer 4-dim vectors (all-positive components
  // so cosines are high and the threshold actually splits), 2-4 centroids
  private val corpus: Gen[(Seq[(Long, Seq[Double])], Seq[(Long, Seq[Double])])] =
    for {
      n <- Gen.choose(8, 40)
      k <- Gen.choose(2, 4)
      vs <- Gen.listOfN(n, Gen.listOfN(4, Gen.choose(1, 5)))
      cs <- Gen.listOfN(k, Gen.listOfN(4, Gen.choose(1, 5)))
    } yield (
      vs.zipWithIndex.map { case (v, i) => (i.toLong, v.map(_.toDouble)) },
      cs.zipWithIndex.map { case (c, i) => (i.toLong, c.map(_.toDouble)) })

  test("semanticDedup equals the in-memory reference on random corpora") {
    for (((vecs, cents), i) <- samples(corpus, 10, seed = 11L).zipWithIndex) {
      val w = 1 + (i % 4)
      val tau = 0.7 + 0.1 * (i % 3)
      val df = vecs.toDF("vec_id", "embedding")
      val cdf = cents.toDF("cid", "cvec")
      val got = SemDedup.semanticDedup(df, "embedding", "vec_id", cdf,
          window = w, threshold = tau)
        .collect()
        .map(r => r.getLong(1) ->
          ((r.getLong(0), r.getLong(2), r.getDouble(3), r.getInt(4))))
        .toMap
      assert(got === ref(vecs, cents, w, tau),
        s"case $i: w=$w tau=$tau n=${vecs.size} k=${cents.size}")
    }
  }

  test("rank-1 rows are never duplicates; keepers outrank their dups") {
    val (vecs, cents) = samples(corpus, 1, seed = 99L).head
    val out = SemDedup.semanticDedup(
      vecs.toDF("vec_id", "embedding"), "embedding", "vec_id",
      cents.toDF("cid", "cvec"), window = 8, threshold = 0.8).collect()
    out.filter(_.getLong(2) == 1L)
      .foreach(r => assert(r.getInt(4) == 0, s"rank-1 flagged dup: $r"))
    // every flagged dup has a same-cluster predecessor within the window
    // at cosine ≥ τ (re-derived from the inputs)
    val byId = vecs.toMap
    val byCluster = out.groupBy(_.getLong(0))
    byCluster.values.foreach { ms =>
      val ordered = ms.sortBy(_.getLong(2))
      ordered.zipWithIndex.filter(_._1.getInt(4) == 1).foreach {
        case (r, idx) =>
          val v = byId(r.getLong(1))
          val prev = ordered.slice(math.max(0, idx - 8), idx)
          assert(prev.exists(p => r6(cos(byId(p.getLong(1)), v)) >= 0.8),
            s"dup with no qualifying keeper: $r")
      }
    }
  }

  test("empty and oversized centroid frames are rejected loudly") {
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    val empty = spark.emptyDataFrame
      .select(org.apache.spark.sql.functions.lit(1L).as("cid"),
        org.apache.spark.sql.functions.lit(Array(1.0)).as("cvec"))
      .limit(0)
    intercept[IllegalArgumentException] {
      SemDedup.semanticDedup(df, "embedding", "vec_id", empty, 4, 0.5)
    }
  }
}
