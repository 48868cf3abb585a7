package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Write-side data layout for scan pruning — the storage half of the
  * scale story, complementing [[Bucketing]] (which co-locates JOIN
  * keys): range-clustering orders data for RANGE predicates.
  *
  * `repartitionByRange` on the cluster keys gives every output file a
  * DISJOINT key range (global range partitioning via sampled bounds),
  * and the in-partition sort tightens each parquet row-group's
  * min/max footer statistics. A reader filtering on the cluster key
  * then prunes whole files (and row groups within surviving files)
  * straight from footer stats — at 100 TB the difference between
  * scanning ~1/files-th of the table and scanning all of it. The
  * shuffle is paid ONCE at write; every subsequent range query wins.
  *
  * The range boundaries come from Spark's reservoir sampling of the
  * key distribution, so files are approximately equal-sized even on
  * skewed keys (contrast hash bucketing, where a hot key concentrates
  * in one bucket). Choose `numFiles` so each file lands near the
  * cluster's `maxPartitionBytes` (default 128 MB) after compression.
  */
object Layout {

  /** Write `df` as range-clustered parquet: `numFiles` files with
    * disjoint, sorted ranges of `keys` (lexicographic). */
  def writeRangeClustered(
      df: DataFrame, path: String, numFiles: Int, keys: String*): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    require(keys.nonEmpty, "at least one cluster key")
    df.repartitionByRange(numFiles, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Materialize [[Sampling.shuffleShards]] as TRAINING SHARDS: one
    * `shard=<i>/` partition directory per shard, rows inside each
    * stored in `shard_pos` order — the deterministic pre-shuffled
    * corpus a sequential training reader consumes shard by shard.
    * The permutation is a pure function of (salt, ids), so two runs
    * over the same corpus produce byte-identical shard assignment and
    * order regardless of input partitioning — resumable data prep.
    *
    * One shuffle (RANGE repartition on the shard value ALONE: rows
    * with equal range keys always land in one partition, so a shard
    * is never split across write tasks and each `shard=` directory
    * holds exactly ONE file — the property the sequential reader's
    * "parquet preserves row order per file" contract rests on. A hash
    * repartition could collide several shards onto one task while
    * others idle — ADVICE r11; range boundaries come from sampling,
    * so two shards may still occasionally share a task, but never the
    * reverse) + one in-partition sort (`shard`, then `shard_pos`,
    * already dense 0..n−1 per shard); tasks are sized corpus/nShards
    * by the uniform shard hash. The `shard_pos` column is kept in the
    * output so a reader can verify order. */
  def writeShuffleShards(
      df: DataFrame, idCol: String, nShards: Int, salt: String,
      path: String): Unit = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    Sampling.shuffleShards(df, idCol, nShards, salt)
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }
}
