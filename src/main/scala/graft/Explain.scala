package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: print the formatted physical plan of one or more
  * driver-contract queries without executing them to completion —
  * the `.explain("formatted")` loop the performance work runs after
  * every operator change (pushdown reached the scan? dims broadcast?
  * one Exchange per shared subtree? codegen spans wide?).
  *
  * Usage: `runMain graft.Explain <sfDir> [queryName ...]`
  * (no names = all queries).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val selected =
      if (names.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else names.map(n => n -> SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query '$n'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")))
    selected.foreach { case (name, fn) =>
      println(s"\n===================== $name =====================")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
