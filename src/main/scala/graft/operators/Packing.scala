package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequence packing: assign documents to fixed-token-budget
  * packs — the batch-construction step before LM training, where
  * documents are concatenated up to the context length and the goal
  * is minimizing pad tokens.
  *
  * Bin packing is inherently sequential, so the distributed contract
  * is explicit rather than pretended away:
  *
  *  - documents are assigned to `numBuckets` buckets by the library's
  *    standard salted-md5 hash ([[Sampling.hashBucket]]) — a pure
  *    function of (salt, id), NOT of Spark's partitioner, so the
  *    assignment is replayable by any engine (the DuckDB oracle
  *    replays it with a recursive CTE) and independent of cluster
  *    size or input layout;
  *  - each bucket packs INDEPENDENTLY — next-fit over its items
  *    sorted by (n_tokens DESC, id), the classic one-pass
  *    approximation that is within 2× of optimal pad waste and needs
  *    no cross-bucket coordination;
  *  - pack ids are globally unique: `bucket << 32 | localPack`.
  *
  * An item larger than the budget gets a pack of its own (callers
  * wanting to split oversized documents should [[TextAnalysis.chunkWindows]]
  * first). This is the repo's one deliberate `mapPartitions` operator:
  * the running-remainder state is per-bucket sequential by nature
  * (SURVEY §2.9 preference order (d) — composition and Catalyst
  * expressions genuinely cannot express it). A partition may carry
  * several buckets; the scan resets its state at each bucket boundary
  * (rows arrive sorted bucket-first), so the physical
  * bucket→partition mapping never leaks into the output.
  *
  * Scale shape (100 TB): one keyed shuffle + in-partition sort, then
  * a streaming single pass per partition with O(1) state — no
  * collect, no driver involvement; bucket count scales the pack
  * granularity, not correctness.
  *
  * Output: (id LONG, n_tokens LONG, pack_id LONG).
  */
object Packing {

  def packSequences(
      df: DataFrame, idCol: String, nTokensCol: String,
      budget: Long, numBuckets: Int, salt: String = "pack"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long"),
        col(nTokensCol).cast("long"),
        Sampling.hashBucket(col(idCol).cast("long"), salt, numBuckets).as("__bucket"))
      .repartition(numBuckets, col("__bucket"))
      .sortWithinPartitions(col("__bucket"), col(nTokensCol).desc, col(idCol))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var bucket = -1L
        var local  = 0L
        var used   = 0L
        var empty  = true
        it.map { case (id, n, b) =>
          if (b != bucket) { bucket = b; local = 0L; used = 0L; empty = true }
          if (!empty && used + n > budget) { local += 1; used = 0L }
          // pack_id layout gives each bucket 2^32 local packs; a
          // counter past that would bleed into the bucket bits and
          // collide with another bucket's packs — fail loudly.
          if (local >= (1L << 32)) sys.error(
            s"bucket $b exceeded 2^32 packs — raise numBuckets or budget")
          empty = false
          used += n
          (id, n, (b << 32) | local)
        }
      }
      .toDF(idCol, nTokensCol, "pack_id")
  }
}
