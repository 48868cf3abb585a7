package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph resolution for dedup pipelines.
  *
  * Near-dup detection ([[Dedup.nearDupPairsShingled]], simhash,
  * embedding LSH) emits PAIRS; a training-data pipeline needs GROUPS —
  * "keep one document per duplicate cluster" is a connected-components
  * problem over the pair graph (pairs are not transitive-closed: A~B
  * and B~C often arrive without A~C). This is the resolution step of
  * every large-scale dedup system.
  *
  * Algorithm: min-label propagation with pointer jumping. Every node
  * starts labeled with itself; each round takes
  *
  *   label(v) ← min(label(v), min over neighbors u of label(u))   (propagate)
  *   label(v) ← label(label(v))                                   (jump)
  *
  * Propagation alone needs O(diameter) rounds (a path graph degrades
  * to O(n)); the jump step short-circuits chains Pointer-jumping-style
  * so convergence is O(log d) rounds in practice — each round is two
  * hash equi-joins + one aggregation, all keyed shuffles. Labels are
  * node ids and only ever DECREASE toward the component minimum, so
  * the fixpoint test ("did any label change?") is an exact
  * anti-monotone comparison, not a heuristic checksum.
  *
  * Scale shape (100 TB): the edge list is symmetrized, deduplicated,
  * and materialized ONCE (`localCheckpoint` — the upstream pair
  * generation, e.g. a full minhash pipeline, must not re-execute per
  * round); per-round state is one (node, label) row per vertex —
  * O(V) longs, never adjacency lists on the driver, no `.collect()`.
  * Skew: a giant component is fine (labels are scalar); a giant-degree
  * VERTEX concentrates its neighbor-min partial aggregation, which
  * Spark's partial aggregation (map-side combine) absorbs.
  *
  * Reference scope note: the reference has no graph operators
  * (SURVEY §2.8 — verified absent); this is a §2.9 extension
  * completing the dedup family.
  */
object Graph {

  /** Connected components of the undirected graph given by an edge
    * list. Output: one row per DISTINCT endpoint, `(node, component)`
    * where `component` is the smallest node id in the component
    * (a canonical, deterministic representative). Isolated nodes
    * (appearing in no edge) are absent — callers that track a node
    * universe union them back as their own singleton component.
    *
    * Node ids may be any orderable type (long doc ids here); self
    * loops are ignored.
    *
    * @throws IllegalStateException if not converged after `maxIter`
    *         rounds (with pointer jumping this needs a component
    *         diameter ~2^maxIter — structurally unreachable; the
    *         guard exists so a logic regression fails loudly rather
    *         than returning a half-merged labeling).
    *
    * Resource note: each round's `localCheckpoint` persists a small
    * (node, label) RDD; superseded rounds' blocks are reclaimed
    * asynchronously by the ContextCleaner once unreferenced. Callers
    * running many CC invocations in one session can force
    * reclamation with `spark.catalog.clearCache()` between calls
    * (Bench/Verify already do).
    */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    val e = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .where(col("u") =!= col("v"))
    // one materialization of the (possibly very expensive) upstream
    // pair generation; everything below re-reads these blocks only
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .localCheckpoint(true)
    // initialization folds in the first propagation round for free:
    // label₀(v) = min(v, min neighbor) costs the same one shuffle as
    // a plain self-label over distinct nodes would
    var labels = sym.groupBy("u")
      .agg(min(col("v")).as("__mn"))
      .select(col("u").as("node"), least(col("u"), col("__mn")).as("label"))
      .localCheckpoint(true)
    var iter = 0
    val labelType = labels.schema("label").dataType
    while (iter < maxIter) {
      // propagate: min over own label and every neighbor's label. The
      // self row threads the previous label through the aggregation
      // (exactly one non-null __prev per node survives the max), so
      // the fixpoint test below reads the round's own checkpointed
      // output — no separate prev-label join and no extra Spark job
      // per round.
      val nbr = sym
        .join(labels.select(col("node").as("v"), col("label")), "v")
        .select(col("u").as("node"), col("label"),
          lit(null).cast(labelType).as("__prev"))
      val prop = labels
        .select(col("node"), col("label"), col("label").as("__prev"))
        .union(nbr)
        .groupBy("node")
        .agg(min("label").as("label"), max("__prev").as("__prev"))
      // jump: label ← label(label). Every label IS a node id of this
      // graph (initial labels are node ids; min and jump preserve
      // that), so the inner join is total.
      val next = prop
        .join(prop.select(col("node").as("label"), col("label").as("__jl")), "label")
        .select(col("node"), col("__jl").as("label"),
          (col("__jl") < col("__prev")).as("__chg"))
        .localCheckpoint(true)
      // labels only ever decrease, so "any __chg" is the exact
      // anti-monotone convergence test — a filter scan over the
      // blocks just materialized, not a recomputation.
      val done = next.where(col("__chg")).isEmpty
      labels = next.select(col("node"), col("label"))
      iter += 1
      if (done) return labels.select(col("node"), col("label").as("component"))
    }
    throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds")
  }
}
