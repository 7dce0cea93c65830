package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for duplicate clustering.
  *
  * A near-dup detector (MinHash/LSH, SimHash, shared-n-gram) emits
  * PAIRS, but a curation pipeline needs CLUSTERS: if A~B and B~C, all
  * three are one duplicate group and exactly one survivor should be
  * kept. That closure is connected components over the pair graph.
  */
object Graph {

  /** Connected components by iterative min-label propagation: every
    * node starts labeled with its own id; each round every node takes
    * the minimum label among itself and its neighbors; at fixpoint each
    * component is labeled with its smallest member id.
    *
    * Output: one row per node that appears in `edges` —
    * (`id`, `component`), where component = min node id reachable.
    *
    * Scale shape: each round is one shuffle of the (symmetrized) edge
    * list joined against the label table — both hash-partitioned on
    * node id, no driver-side state beyond the converged flag. Rounds
    * needed = graph diameter. Near-dup clusters are small and dense
    * (diameter 2-3 in practice), so this converges in a handful of
    * rounds; a corpus with adversarially long chain-shaped components
    * would want the large-star/small-star contraction of Kiveris et
    * al. (MR-CC), which bounds rounds at O(log n) — same join-per-round
    * skeleton, different propagation rule. `localCheckpoint` truncates
    * the growing lineage each round; on a production cluster use
    * reliable `checkpoint` so recomputation-on-executor-loss doesn't
    * replay every round.
    *
    * Termination: each round's update carries a per-node `changed`
    * flag, so the fixpoint probe is a count over the just-checkpointed
    * blocks — no extra join re-deriving the delta (the probe join was
    * ~25% of round cost). Throws if `maxRounds` is hit while labels are
    * still moving — a silent early stop would return WRONG components,
    * so refusing is the only safe behavior.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 25): DataFrame = {
    // the edge list is consumed EVERY round — checkpoint it once, or
    // each iteration re-executes the (often expensive) pair-generation
    // plan feeding this operator. Self-loops make one join+aggregate do
    // the whole round: every node appears as a dst, min over
    // (self ∪ neighbors) IS the propagation step, and the self-loop row
    // carries the node's previous label so the convergence flag costs
    // nothing extra.
    val sym = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"),
        col(srcCol).cast("long").as("dst")))
      .distinct()
    val ids = sym.select(col("src").as("id")).distinct()
    val symSelf = sym
      .union(ids.select(col("id").as("src"), col("id").as("dst")))
      .localCheckpoint()
    var labels = ids
      .select(col("id"), col("id").as("component"))
      .localCheckpoint()
    var round = 0
    var moved = 1L
    while (moved > 0) {
      if (round >= maxRounds)
        throw new IllegalStateException(
          s"connectedComponents: no fixpoint after $maxRounds rounds " +
            "(component diameter exceeds the round budget)")
      val next = symSelf.join(labels, symSelf("src") === labels("id"))
        .groupBy(col("dst"))
        .agg(min(col("component")).as("component"),
          min(when(col("src") === col("dst"), col("component"))).as("prev"))
        .select(col("dst").as("id"), col("component"),
          (col("component") < col("prev")).as("changed"))
        .localCheckpoint()
      moved = next.where(col("changed")).count()
      labels = next.select(col("id"), col("component"))
      round += 1
    }
    labels
  }

  /** Connected components by min-propagation WITH PATH-HALVING — the
    * scale path for ADVERSARIAL component shapes, in the spirit of the
    * star-contraction family (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14): plain min-label propagation
    * needs diameter rounds (a 10⁶-node chain = 10⁶ rounds); adding a
    * pointer-jumping step (`p(u) ← min(p(u), p(p(u)))`) each round
    * collapses chains exponentially, bounding rounds at O(log n)
    * regardless of shape.
    *
    * Each round is two self-joins on the parent table (propagate mins
    * over edges; then jump one pointer level), both keyed exchanges —
    * no driver state. Fixpoint when no parent moves; at fixpoint every
    * node's parent is its component's min id (parents are always
    * same-component node ids and non-increasing, and a stable state
    * forces equality across every edge). Output matches
    * [[connectedComponents]]: (id, component) — the two formulations
    * check each other in GraphSpec, including a chain whose diameter
    * exceeds this variant's round budget.
    */
  def connectedComponentsStar(edges: DataFrame, srcCol: String,
      dstCol: String, maxRounds: Int = 50): DataFrame = {
    val symRaw = edges.select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"))
      .union(edges.select(col(dstCol).cast("long").as("u"),
        col(srcCol).cast("long").as("v")))
      .distinct()
    val ids = symRaw.select(col("u").as("id")).distinct()
    // self-loops let ONE edges⋈parent join compute min over
    // {p(u)} ∪ {p(v) : (u,v) ∈ E} with no union of parent-derived
    // branches (duplicate attribute ids across union branches trip
    // constraint propagation)
    val sym = symRaw
      .union(ids.select(col("id").as("u"), col("id").as("v")))
      .localCheckpoint()
    // parent(u) = min(u, neighbors(u)) — one propagation for free
    var parent = sym
      .groupBy(col("u"))
      .agg(min(col("v")).as("mn"))
      .select(col("u").as("id"), least(col("u"), col("mn")).as("p"))
      .localCheckpoint()
    var round = 0
    var moved = 1L
    while (moved > 0) {
      if (round >= maxRounds)
        throw new IllegalStateException(
          s"connectedComponentsStar: no fixpoint after $maxRounds rounds")
      val propagated = sym.join(parent, sym("v") === parent("id"))
        .groupBy(sym("u")).agg(min(col("p")).as("p"))
        .select(col("u").as("id"), col("p"))
        .localCheckpoint() // materialized: the jump self-joins it twice
      // path-halving: point u at min(p(u), p(p(u)))
      val hop = propagated.select(col("id").as("pid"), col("p").as("pp"))
      val next = propagated
        .join(hop, propagated("p") === hop("pid"))
        .select(propagated("id"), least(propagated("p"), col("pp")).as("p"))
        .localCheckpoint()
      moved = next
        .join(parent.select(col("id"), col("p").as("prev")), "id")
        .where(col("p") =!= col("prev")).count()
      parent = next
      round += 1
    }
    parent.select(col("id"), col("p").as("component"))
  }
}
