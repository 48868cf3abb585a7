package graft

import org.apache.spark.sql.SparkSession

/** Per-QUERY diagnostic for the bench suite (optimization rounds):
  * runs each named query `reps` times in one warm session and prints
  * every rep's wall seconds — rep 1 carries analysis+codegen+AQE
  * planning, reps 2+ are steady-state compute — so a "slow" bench
  * entry can be attributed to fixed per-query overhead vs real work
  * before any plan surgery. Mirrors Bench's session config exactly
  * (local[$SPARK_GRAFT_CPUS], shuffle.partitions=cpus, noop sink,
  * clearCache+GC between reps).
  *
  * Usage: `sbt "runMain graft.QueryProbe <name-substring>..."`
  * with SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench;
  * GRAFT_PROBE_REPS overrides the default 3.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.get("GRAFT_PROBE_REPS").flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(3)
    // GRAFT_EXTRA_CONF="k=v;k2=v2": arbitrary conf overrides for
    // config A/B probes (measurement-only — Bench stays contractual).
    val extra = sys.env.get("GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.contains("="))
      .map { kv => val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1)) }
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("GRAFT_CODEGEN_CACHE", "5000"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => builder.config(k, v); System.err.println(s"[probe] extra conf $k=$v") }
    val spark = graft.util.LocalScratch.configure(builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    // Same warm-up as Bench: JVM/codegen/noop/shuffle init outside timers.
    try {
      import org.apache.spark.sql.functions.{col, pmod, lit}
      spark.range(0, 100000).toDF("i").repartition(4)
        .groupBy(pmod(col("i"), lit(7)).as("k")).count()
        .write.mode("overwrite").format("noop").save()
    } catch { case _: Throwable => () }
    val selected =
      if (args.isEmpty) Seq.empty
      else SparkEntry.queries.toSeq.filter { case (n, _) => args.exists(n.contains) }.sortBy(_._1)
    require(selected.nonEmpty, s"no query matches ${args.mkString(", ")}")
    // GRAFT_PROBE_STAGES=1: per-stage max/median task ms + shuffle
    // volumes to stderr (attributes a slow rep to its straggler stage)
    if (sys.env.get("GRAFT_PROBE_STAGES").contains("1")) {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
      spark.sparkContext.addSparkListener(new SparkListener {
        private val taskDur = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]]()
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          if (t.taskInfo != null && t.taskInfo.successful) {
            taskDur.computeIfAbsent(t.stageId, _ => new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]())
              .add(t.taskInfo.duration)
          }
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
          import scala.jdk.CollectionConverters._
          val info = s.stageInfo
          val m = info.taskMetrics
          val ds = Option(taskDur.get(info.stageId)).map(_.asScala.toSeq.map(_.longValue).sorted).getOrElse(Seq.empty)
          val (mx, md) = if (ds.isEmpty) (0L, 0L) else (ds.last, ds(ds.size / 2))
          if (mx >= 200)
            System.err.println(
              f"[stage] ${info.stageId}%4d tasks=${info.numTasks}%4d max_ms=$mx%6d med_ms=$md%6d " +
                f"sr=${m.shuffleReadMetrics.recordsRead}%10d sw=${m.shuffleWriteMetrics.recordsWritten}%10d " +
                f"spill=${(m.memoryBytesSpilled + m.diskBytesSpilled) / 1000000}%5dMB " +
                info.name.take(60))
        }
      })
    }
    // GRAFT_PROBE_SAMPLE=1: sample executor task threads during every
    // rep and print the hottest frames after each query — attributes
    // per-task CPU to the expression/operator responsible.
    val sampleTally = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    if (sys.env.get("GRAFT_PROBE_SAMPLE").contains("1")) {
      val t = new Thread(() => {
        while (true) {
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (th, st) =>
            if (th.getName.startsWith("Executor task launch") && st.nonEmpty) {
              // leaf-side signature: top frame plus first spark/graft frame
              val leaf = st.take(2).map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}").mkString("|")
              val owner = st.find(f => f.getClassName.contains("expressions") ||
                  f.getClassName.contains("graft") || f.getClassName.contains("execution"))
                .map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}").getOrElse("-")
              sampleTally.merge(s"$leaf @ $owner", 1, (a: Integer, b: Integer) => a + b)
            }
          }
          Thread.sleep(23)
        }
      })
      t.setDaemon(true); t.start()
    }
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def codeCache(): String = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith("CodeHeap"))
        .map(p => s"${p.getName.replace("CodeHeap '", "").replace("'", "").replace(" nmethods", "")}=" +
          s"${p.getUsage.getUsed / 1048576}/${p.getUsage.getMax / 1048576}M")
        .mkString(" ")
    }
    for ((name, fn) <- selected) {
      val times = (1 to reps).map { i =>
        System.err.println(s"[probe] --- $name rep$i ---")
        val g0 = gcMs()
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          if (i == 1) {
            df.queryExecution.executedPlan // force analysis->physical planning
            val ph = df.queryExecution.tracker.phases
              .map { case (p, s) => s"$p=${s.endTimeMs - s.startTimeMs}ms" }.mkString(" ")
            val tPlan = (System.nanoTime() - t0) / 1e9
            System.err.println(f"[probe]   $name plan-build $tPlan%5.2f s  phases: $ph")
          }
          df.write.mode("overwrite").format("noop").save()
        }
        catch { case e: Throwable => System.err.println(s"[probe] $name rep$i FAILED: ${e.getMessage}") }
        val el = (System.nanoTime() - t0) / 1e9
        val gc = gcMs() - g0
        val cached = spark.sparkContext.getPersistentRDDs.values
        spark.catalog.clearCache()
        cached.foreach(_.unpersist(blocking = true))
        System.gc()
        (el, gc)
      }
      println(f"[probe] $name%-36s ${times.map { case (t, g) => f"$t%6.2f(gc${g}%5dms)" }.mkString(" ")}  cc[${codeCache()}]")
      if (!sampleTally.isEmpty) {
        import scala.jdk.CollectionConverters._
        println(s"[samples] hottest task-thread frames for $name:")
        sampleTally.asScala.toSeq.sortBy(-_._2).take(30).foreach { case (k, v) =>
          println(f"  $v%6d  $k")
        }
        sampleTally.clear()
      }
    }
    spark.stop()
  }
}
