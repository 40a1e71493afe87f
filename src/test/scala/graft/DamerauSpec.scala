package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.DamerauLevenshtein

/** Semantics of the native unrestricted Damerau–Levenshtein
  * expression, pinned against DuckDB's `damerau_levenshtein` (the
  * oracle engine) — including the case separating the unrestricted
  * form from the common optimal-string-alignment restriction. */
class DamerauSpec extends SparkSpec {
  import spark.implicits._

  // expected values are DuckDB damerau_levenshtein outputs
  private val vectors = Seq(
    ("ca", "abc", 2),        // UNRESTRICTED: OSA would say 3
    ("abcdef", "abcfed", 2), // transpose + substitute
    ("ab", "ba", 1),         // one transposition
    ("abab", "baba", 2),
    ("kitten", "sitting", 3),
    ("", "abc", 3), ("abc", "", 3), ("", "", 0),
    ("same", "same", 0),
    ("abc", "acb", 1))

  test("matches DuckDB on pinned vectors; levenshtein upper-bounds it") {
    vectors.foreach { case (a, b, exp) =>
      assert(DamerauLevenshtein.distance(a, b) === exp,
        s"distance('$a','$b')")
      assert(DamerauLevenshtein.distance(b, a) === exp, "symmetry")
    }
    // transpositions only ever HELP: dl <= levenshtein on real names
    val p = spark.read.parquet(s"$sf001/part.parquet")
      .select($"p_name").limit(100)
    val bad = p.as("a").crossJoin(p.as("b")).limit(3000)
      .select(DamerauLevenshtein(col("a.p_name"), col("b.p_name"))
        .as("dl"),
        levenshtein(col("a.p_name"), col("b.p_name")).as("lev"))
      .filter($"dl" > $"lev")
    assert(bad.isEmpty, bad.collect().take(3).mkString(", "))
  }

  test("SQL registration + null propagation") {
    val r = spark.sql("SELECT damerau_levenshtein('ca', 'abc') AS d, " +
      "damerau_levenshtein(CAST(NULL AS STRING), 'x') AS n").head
    assert(r.getInt(0) === 2)
    assert(r.isNullAt(1))
  }
}
