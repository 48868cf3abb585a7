package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: execute named `SparkEntry.queries` against
  * an sf dir and print each executed plan (post-AQE) — the iterate-on-
  * the-plan loop ("explain, then make it the plan you'd want") as a
  * one-command tool.
  *
  * Usage: `sbt "runMain graft.PlanDump <sfDir> <query...>"`
  * (no names = every query). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.maxMetadataStringLength", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    functions.GraftFunctions.register(spark)
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown quer${if (unknown.size == 1) "y" else "ies"} ${unknown.mkString(", ")}; " +
        s"valid names:\n  ${SparkEntry.queries.keys.toSeq.sorted.mkString("\n  ")}")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // materialize so AQE finalizes the plan
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
