package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan-inspection / micro-timing main for the judged query surface.
  *
  * {{{
  * sbt "runMain graft.Explain q1_agg j3_star_join"   // formatted plans
  * sbt "runMain graft.Explain --time dedup_minhash"  // cold+warm timing
  * sbt "runMain graft.Explain --all"                 // every query's plan
  * }}}
  *
  * `SPARK_GRAFT_SF_DIR` selects the data (default sf0.01 for plans —
  * plan shape is SF-independent; timing defaults to sf0.1).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val timing = args.contains("--time")
    val names =
      if (args.contains("--all")) SparkEntry.queries.keys.toSeq.sorted
      else args.filterNot(_.startsWith("--")).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      if (timing) "/root/testdata/sf0.1" else "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (timing) // JVM/codegen warmup so cold times measure the query
      try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }

    for (name <- names) {
      println(s"######## $name ########")
      val q = SparkEntry.queries(name)(spark, sfDir)
      if (timing) {
        def run(label: String): Unit = {
          val t0 = System.nanoTime()
          q.write.format("noop").mode("overwrite").save()
          println(f"[$name $label] ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
        run("cold"); run("warm")
      } else println(q.queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
