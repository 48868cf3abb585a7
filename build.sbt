ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pythoncdcspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked `run` output goes straight to stdout (no `[info] ` logger
// prefix) so the driver can parse Bench's single JSON line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // JIT code cache sized for a 190-query single-JVM run: the default
  // 240 MB fills mid-suite (one composite query family alone JITs
  // ~96 MB across the three segments — QueryProbe prints occupancy),
  // and a tight cache makes the sweeper flush hot compiled methods,
  // re-JITing them on the next query — the mechanism behind
  // mid-suite slowdowns of the late-alphabet composites (r21).
  // Standard sizing advice for long-lived executors running
  // codegen-heavy Spark SQL; harmless when unused (virtual memory
  // reservation, committed on demand).
  "-XX:ReservedCodeCacheSize=512m",
) ++ {
  // Heap for the forked single-JVM Spark driver+executor. CLAMPED to
  // 16g: local[32] at the bench scale (sf0.1) peaks well under 8g,
  // and oversized heaps actively destroy local-mode performance —
  // G1's adaptive young gen grows to ~60% of the heap, so every TLAB
  // allocation sweeps cold never-touched pages (faults + zeroing tens
  // of GB per young cycle). Measured on identical code/data: the
  // dedup verify stage costs 15s CPU at -Xmx8g vs 210s at -Xmx90g,
  // and repeated same-session queries oscillate 15s -> 375s. A real
  // cluster sizes EXECUTOR heaps (8-32g each) — a giant local heap
  // models nothing and just makes benchmarks unreproducible.
  val raw = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
  // Accept both g/G and m/M suffixes (m rounds up to whole GiB).
  val req = "([0-9]+)\\s*([gGmM])".r.findFirstMatchIn(raw).map { m =>
    val n = m.group(1).toLong
    if (m.group(2).equalsIgnoreCase("g")) n else math.max(1L, (n + 1023) / 1024)
  }
  if (req.isEmpty && sys.env.contains("SPARK_DRIVER_MEM"))
    println(s"[warn] SPARK_DRIVER_MEM='$raw' unparseable (want e.g. 8g or 4096m); using 8g")
  val wanted = req.getOrElse(8L)
  if (wanted > 16)
    println(s"[warn] SPARK_DRIVER_MEM='$raw' clamped to 16g (oversized local heaps destroy G1 performance; see comment above)")
  // GRAFT_G1_YOUNG_CAP=<pct> caps G1's young gen — this NEUTRALIZES
  // the pathology above at its root on over-provisioned heaps (the
  // adaptive young gen is what grows to ~60% of the heap): measured
  // on the exact PPJoin 50x ScaleStress, a 16g heap ran 221.9s
  // uncapped vs 73.7s with the cap at 15 — the same 70.4s an 8g heap
  // gets. OPT-IN, not default: on right-sized (8g) heaps the same
  // cap COSTS ~30% on allocation-heavy ops (minhash 50x: 30.0s
  // uncapped vs 42.3s capped — more frequent young cycles with more
  // promotion). Use it only when a run genuinely needs a heap bigger
  // than its working set (the 100x exact-PPJoin candidate volume).
  val youngCap = sys.env.get("GRAFT_G1_YOUNG_CAP")
    .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
    .map(p => Seq("-XX:+UnlockExperimentalVMOptions", s"-XX:G1MaxNewSizePercent=$p"))
    .getOrElse(Seq.empty)
  Seq(s"-Xmx${math.min(wanted, 16L)}g") ++ youngCap
}
