package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup.cosine

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteTopK]]: exact cosine top-k via broadcast(query) × corpus —
  *    the baseline; correct at any corpus size as long as the *query*
  *    set is small (queries broadcast; corpus never collected).
  *  - [[lshTopK]]: random-hyperplane LSH — bucket by sign bits, search
  *    only within the probe buckets. The 100 TB path: corpus bucket
  *    assignment is a narrow projection, the join key is the bucket id.
  *
  * Hyperplanes are generated from a fixed seed so results are
  * deterministic and reproducible across runs/engines.
  */
object Ann {

  /** Normalize an embedding column (float[] → unit-norm double[]). */
  def unitNorm(v: Column): Column = {
    val d = v.cast("array<double>")
    val n = sqrt(aggregate(transform(d, x => x * x), lit(0.0),
      (acc, x) => acc + x))
    transform(d, x => x / n)
  }

  /** Exact top-k by cosine: broadcast the (small) query set against the
    * corpus, rank per query. Ties broken by corpus id; cosine rounded so
    * the ranking is stable across summation orders. */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, vecCol: String,
      idCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv")))
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val scored = c.join(q, col("query_id") =!= col("corpus_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rank"))
  }

  /** Deterministic random hyperplanes: `numPlanes × dim` doubles from a
    * seeded RNG (generated driver-side once; broadcast as literals). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(rng.nextGaussian())
  }

  /** Sign-bit bucket id for a vector under the given hyperplanes.
    * Each plane's projection is a native codegen [[DotProduct]] — the
    * interpreted `aggregate(zip_with(...))` form would run numPlanes
    * interpreted loops per row. */
  def bucketId(v: Column, planes: Array[Array[Double]]): Column = {
    val d = v.cast("array<double>")
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      val dot = org.apache.spark.sql.graftx.DotProduct(d, plane)
      when(dot >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** LSH top-k: candidates limited to the query's bucket; exact cosine
    * rank within. Recall < 1 by construction; [[recall]] measures it
    * against the brute-force baseline. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, vecCol: String,
      idCol: String, k: Int, numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"),
      bucketId(col(vecCol), planes).as("bucket")))
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"),
      bucketId(col(vecCol), planes).as("bucket"))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rank"))
  }

  /** Fraction of brute-force top-k pairs the ANN path recovered. */
  def recall(ann: DataFrame, brute: DataFrame): Double = {
    val hits = brute.select("query_id", "corpus_id")
      .intersect(ann.select("query_id", "corpus_id")).count()
    val total = brute.count()
    if (total == 0) 1.0 else hits.toDouble / total
  }
}
