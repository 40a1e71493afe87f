package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.JaroWinkler

/** Semantics of the native Jaro–Winkler expression, pinned against
  * DuckDB's `jaro_winkler_similarity` outputs (the oracle engine) on
  * hand-checked vectors, plus bounds/symmetry properties and the
  * SQL-registration path. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  // (a, b, expected) — expected values are DuckDB
  // jaro_winkler_similarity outputs, which the classic definition
  // (window ⌊max/2⌋−1, t = out-of-order/2, 0.7 boost threshold,
  // prefix cap 4) reproduces exactly
  private val vectors = Seq(
    ("martha", "marhta", 0.9611111111111111),   // 1 transposition + prefix 3
    ("DIXON", "DICKSONX", 0.8133333333333332),  // prefix 2 boost
    ("CRATE", "TRACE", 0.7333333333333334),     // jaro > 0.7 but prefix 0
    ("abcd", "abzzzzzzzzzzzzzzzzzzzzzz", 0.5277777777777778), // ≤ 0.7: no boost
    ("abcdefgh", "abcdzzzz", 0.6666666666666666),             // ≤ 0.7: no boost
    ("abcdefgh", "abcdefzz", 0.9),              // prefix 6 CAPPED at 4
    ("kitten", "sitting", 0.746031746031746),
    ("abc", "abc", 1.0),
    ("", "abc", 0.0), ("", "", 0.0),            // DuckDB: empty ⇒ 0
    ("a", "b", 0.0),
    ("a", "a", 1.0),                            // len-1 identity (window clamp)
    ("a", "ab", 0.85),                          // len-1 vs len-2 match
    ("ab", "ba", 0.0))                          // window 0: no matches

  test("matches DuckDB on pinned vectors (scalar + column + codegen)") {
    vectors.foreach { case (a, b, exp) =>
      assert(math.abs(JaroWinkler.similarity(a, b) - exp) < 1e-12,
        s"similarity('$a','$b')")
    }
    val out = vectors.toDF("a", "b", "exp")
      .withColumn("jw", JaroWinkler($"a", $"b"))
      .filter(abs($"jw" - $"exp") > 1e-12)
    assert(out.isEmpty, out.collect().mkString(", "))
  }

  test("bounds, symmetry, identity on real part names") {
    val p = spark.read.parquet(s"$sf001/part.parquet")
      .select($"p_name").limit(200)
    val pairs = p.as("a").crossJoin(p.as("b")).limit(5000)
      .select(JaroWinkler(col("a.p_name"), col("b.p_name")).as("ab"),
        JaroWinkler(col("b.p_name"), col("a.p_name")).as("ba"),
        (col("a.p_name") === col("b.p_name")).as("same"))
    assert(pairs.filter($"ab" < 0 || $"ab" > 1).isEmpty)
    assert(pairs.filter($"ab" =!= $"ba").isEmpty, "symmetric")
    assert(pairs.filter($"same" && $"ab" =!= 1.0).isEmpty, "identity = 1")
  }

  test("SQL registration + null propagation") {
    val r = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS jw, " +
        "jaro_winkler(CAST(NULL AS STRING), 'x') AS n").head
    assert(math.abs(r.getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(r.isNullAt(1))
  }
}
