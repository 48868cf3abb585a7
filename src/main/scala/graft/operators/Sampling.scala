package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic (hash-based) sampling and dataset splitting.
  *
  * Training pipelines need train/val/test assignment and subsampling
  * that is STABLE: the same document must land in the same split on
  * every run, engine, partition layout, and cluster size — otherwise
  * re-runs leak val into train and ablations are incomparable. RNG
  * sampling (`df.sample`, `rand()`) guarantees none of that: it
  * depends on partition boundaries and seed plumbing. Salted-hash
  * assignment guarantees all of it: bucket = md5(salt ‖ key) mod N is
  * a pure per-row function of (salt, key).
  *
  * The salt isolates decisions: splitting with one salt and
  * subsampling with another keeps the two choices statistically
  * independent (md5 avalanche), so a 25% sample of train is unbiased
  * w.r.t. the split. Changing a salt re-draws the whole assignment.
  *
  * Scale shape (100 TB): every operator here is a map-side projection
  * or filter — zero shuffles, trivially partition-parallel, and the
  * md5 is codegen'd (no UDF). Hashes derive from md5 (portable across
  * Spark/DuckDB/Java) so assignments are oracle-checkable, like every
  * fingerprint in this library.
  */
object Sampling {

  /** Stable bucket in [0, buckets): integer value of the first 8 hex
    * chars of md5(salt:key), mod buckets. 2^32 hash space spreads the
    * mod bias below 1e-7 for any buckets <= 10^4. */
  def hashBucket(key: Column, salt: String, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    conv(substring(md5(concat_ws(":", lit(salt), key.cast("string"))), 1, 8), 16, 10)
      .cast("long") % buckets
  }

  /** Add a `split` column: 'train' for the first `trainPct` buckets
    * of 100, 'val' for the next `valPct`, 'test' for the rest. */
  def withSplit(
      df: DataFrame, keyCol: String, salt: String,
      trainPct: Int, valPct: Int, outCol: String = "split"): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"trainPct=$trainPct + valPct=$valPct must fit in 100")
    val b = hashBucket(col(keyCol), salt, 100)
    df.withColumn(outCol,
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic `pct`% subsample: keeps rows whose hash bucket
    * falls below pct. Subsets nest: a 10% sample is contained in the
    * 25% sample under the same salt (useful for scaling-law runs). */
  def sampled(df: DataFrame, keyCol: String, salt: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    df.filter(hashBucket(col(keyCol), salt, 100) < pct)
  }

  /** Stratified deterministic subsample: a keep-percentage per value
    * of `stratumCol` (the data-mixing primitive — e.g. keep 50% of
    * English, 10% of everything else, and the mixture is stable
    * across runs and engines). Strata missing from `pctByStratum`
    * fall back to `defaultPct`. Within a stratum, samples nest across
    * pct changes exactly like [[sampled]]; the stratum only selects
    * the threshold, never re-draws the hash. Map-side filter, zero
    * shuffles. */
  def stratifiedSampled(
      df: DataFrame, keyCol: String, stratumCol: String, salt: String,
      pctByStratum: Map[String, Int], defaultPct: Int): DataFrame = {
    (pctByStratum.values.toSeq :+ defaultPct).foreach(p =>
      require(p >= 0 && p <= 100, s"pct must be in [0,100], got $p"))
    // stable threshold expression: sorted iteration so plans (and
    // their canonicalized forms) don't depend on map ordering
    val threshold = pctByStratum.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (stratum, pct)) =>
        when(col(stratumCol) === stratum, lit(pct)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), salt, 100) < threshold)
  }
}
