package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query wall
  * seconds. A failing query is reported in "errors" and contributes
  * -1.0 to "queries" (never a fake timing — round-1 swallowed
  * exceptions into plausible-looking numbers). The JSON line goes to
  * stdout unprefixed (build.sbt sets `run / outputStrategy :=
  * StdoutOutput` so sbt's [info] logger never wraps it) and is also
  * written to bench_out.json as a belt-and-braces parse path.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(120)
          false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-32s ${elapsed}%8.2f s")
      // Isolate queries from each other — all OUTSIDE the timers:
      // clearCache() initiates block removal asynchronously, so a
      // query's GC/eviction debt would otherwise land on the NEXT
      // timer (measured: a 3.5 s query attributed 100+ s). Unpersist
      // blocking, then force a full GC so each timer starts from a
      // quiet heap. (The library operators no longer persist anything
      // — this is belt-and-braces for future queries that might.)
      val cached = spark.sparkContext.getPersistentRDDs.values
      spark.catalog.clearCache()
      cached.foreach(_.unpersist(blocking = true))
      System.gc()
      name -> (if (ok) elapsed else -1.0)
    }
    def q(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":${q(sfDir)}}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), line)
    spark.stop()
  }
}
