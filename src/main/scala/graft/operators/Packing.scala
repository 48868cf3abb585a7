package graft.operators

import org.apache.spark.TaskContext
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
  *  - documents are hash-partitioned by id into `numPartitions`
  *    (deterministic: same data + same partition count ⇒ same packs,
  *    independent of cluster size or input layout);
  *  - each partition packs INDEPENDENTLY — next-fit over its items
  *    sorted by (n_tokens DESC, id), the classic one-pass
  *    approximation that is within 2× of optimal pad waste and needs
  *    no cross-partition coordination;
  *  - pack ids are globally unique: `partitionId << 32 | localPack`.
  *
  * An item larger than the budget gets a pack of its own (callers
  * wanting to split oversized documents should [[TextAnalysis.chunkWindows]]
  * first). This is the repo's one deliberate `mapPartitions` operator:
  * the running-remainder state is per-partition sequential by nature
  * (SURVEY §2.9 preference order (d) — composition and Catalyst
  * expressions genuinely cannot express it).
  *
  * Scale shape (100 TB): one keyed shuffle + in-partition sort, then
  * a streaming single pass per partition with O(1) state — no
  * collect, no driver involvement; partition count scales the pack
  * granularity, not correctness.
  *
  * Output: (id LONG, n_tokens LONG, pack_id LONG).
  */
object Packing {

  def packSequences(
      df: DataFrame, idCol: String, nTokensCol: String,
      budget: Long, numPartitions: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(numPartitions > 0, s"numPartitions must be positive, got $numPartitions")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(nTokensCol).cast("long"))
      .repartition(numPartitions, col(idCol))
      .sortWithinPartitions(col(nTokensCol).desc, col(idCol))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId().toLong
        var local = 0L
        var used  = 0L
        var empty = true
        it.map { case (id, n) =>
          if (!empty && used + n > budget) { local += 1; used = 0L }
          // pack_id layout gives each partition 2^32 local packs; a
          // counter past that would bleed into the partition bits and
          // collide with another partition's packs — fail loudly.
          if (local >= (1L << 32)) sys.error(
            s"partition $pid exceeded 2^32 packs — raise numPartitions or budget")
          empty = false
          used += n
          (id, n, (pid << 32) | local)
        }
      }
      .toDF(idCol, nTokensCol, "pack_id")
  }
}
