package graft

import org.apache.spark.sql.SparkSession

/** Samples the main thread's stack while a named query's DataFrame is
  * CONSTRUCTED (eager per-step analysis) and prints the hottest
  * frames — attributes multi-second plan-build cost (QueryProbe's
  * `plan-build` line) to the analyzer rule / code path responsible.
  * Measurement-only; not part of the driver contract.
  *
  * Usage: `sbt "runMain graft.PlanBuildProfile <query>"` */
object PlanBuildProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val name = args.headOption.getOrElse("p_curation_lineage")
    val fn = SparkEntry.queries(name)
    // warm-up: one full construction so classloading/JIT noise drops out
    fn(spark, sfDir).queryExecution.executedPlan
    val main = Thread.currentThread()
    val tally = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var run = true
    val sampler = new Thread(() => {
      while (run) {
        val st = main.getStackTrace
        // first graft/catalyst frame below the top gives the hot leaf;
        // record the top 3 catalyst/spark frames as a mini-signature
        val sig = st.iterator
          .filter(f => f.getClassName.startsWith("org.apache.spark.sql") ||
            f.getClassName.startsWith("graft"))
          .take(3).map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}")
          .mkString(" < ")
        if (sig.nonEmpty) tally.merge(sig, 1, (a, b) => a + b)
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    val t0 = System.nanoTime()
    sampler.start()
    val df = fn(spark, sfDir)
    df.queryExecution.executedPlan
    run = false
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"== $name plan-build (warm) $sec%.2f s; hottest construction-path signatures:")
    import scala.jdk.CollectionConverters._
    tally.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (k, v) =>
      println(f"  $v%5d  $k")
    }
    spark.stop()
  }
}
