package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated analytic tables (see TESTDATA.md /
  * FIXTURES.md §B). One parquet file per table under `dir`.
  *
  * Reads are plain `spark.read.parquet` so Catalyst gets full column
  * pruning + predicate pushdown into the scan; never cache here — the
  * caller decides lifetime.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scale-adaptive scan spread for EXPRESSION-HEAVY aggregates over
    * the single-file feeds (the [[graft.operators.Dedup]] `spreadText`
    * lesson): the driver ships each table as ONE parquet file with
    * ONE row group, so the scan — and every projection/filter/partial
    * aggregate fused into the scan stage — runs on ONE core
    * regardless of session parallelism (byte-splitting cannot help: a
    * single row group is read whole). One round-robin exchange of the
    * post-pushdown scan output moves the per-row work to cluster
    * parallelism — but the exchange itself costs a full pass of the
    * surviving rows, so this is applied PER QUERY where the per-row
    * work measurably dominates (decimal moment aggregates, wide
    * cube/rollup expansion), not blanket in [[t]]: a blanket spread
    * A/B'd −4 s net across the relational block (join-shaped queries
    * pay wide-row exchange for nothing; r21 bench pair). No-op when
    * the scan already plans enough splits (≥ cores/2) — at real
    * multi-row-group scale the spread never fires, and PushedFilters
    * are unchanged either way (predicates push through Repartition).
    */
  def spreadScan(df: DataFrame): DataFrame = {
    val cores = spark.sparkContext.defaultParallelism
    val parts = df.rdd.getNumPartitions
    if (parts < cores / 2) df.repartition(cores) else df
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** Exposes `ts` as a µs Spark timestamp and `ts_ns` as ns-since-epoch
    * long (for exact ordering/tiebreaks against a ns-precision oracle).
    *
    * Schema-adaptive: the driver has shipped `events.ts` both as parquet
    * TIMESTAMP(NANOS) — which Spark 4 refuses to read as a timestamp
    * ([PARQUET_TYPE_ILLEGAL]), so we read it as a raw long via the legacy
    * conf and truncate with integer `div 1000` (a double division would
    * lose precision above 2^53 ns) — and as plain `timestamp[us]` with
    * no tz metadata (Spark reads that as TIMESTAMP_NTZ), which needs
    * only a cast to the session-tz timestamp plus
    * `ts_ns = unix_micros(ts) * 1000` (sub-µs ties don't exist in that
    * feed, so ordering is unchanged). The NTZ wall clock is UTC by the
    * feed's construction; every graft entry point pins
    * `spark.sql.session.timeZone=UTC`, making the cast exact. */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // the nanos feed can fail at plan time (AnalysisException) or, on
    // some Spark versions, wrapped at action time — unwrap the cause
    // chain and match the typed exception OR its error class, never a
    // class-name substring (ADVICE r11)
    def isNanosRefusal(e: Throwable): Boolean =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).exists {
        case a: org.apache.spark.sql.AnalysisException =>
          a.getCondition == "PARQUET_TYPE_ILLEGAL" ||
            Option(a.getMessage).exists(_.contains("PARQUET_TYPE_ILLEGAL"))
        case t => Option(t.getMessage).exists(_.contains("PARQUET_TYPE_ILLEGAL"))
      }
    val raw =
      try t("events")
      catch {
        case e: Exception if isNanosRefusal(e) =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          t("events")
      }
    raw.schema("ts").dataType match {
      case TimestampType | TimestampNTZType =>
        raw
          .withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
      case LongType =>
        raw
          .withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case other =>
        throw new IllegalStateException(
          s"events.ts: expected TIMESTAMP, TIMESTAMP_NTZ, or LONG (ns feed), got $other")
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
