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
    //
    // Every per-round exchange carries a USER-SPECIFIED partition count
    // (repartition(n, key) — REPARTITION_BY_NUM, exempt from AQE
    // coalescing): the label/edge tables are kilobytes, so AQE's
    // byte-based coalescing otherwise folds each round's CPU-heavy
    // join+aggregate onto ONE core — observed in the round-10 bench as
    // 87 s and 368 s single-task stages inside dedup_cluster_cc. Same
    // pathology and fix as kcorePeel below.
    val shufN = edges.sparkSession.sessionState.conf.numShufflePartitions
    val sym = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"),
        col(srcCol).cast("long").as("dst")))
      .distinct()
    val ids = sym.select(col("src").as("id")).distinct()
    val symSelf = sym
      .union(ids.select(col("id").as("src"), col("id").as("dst")))
      .repartition(shufN, col("src"))
      .localCheckpoint()
    var labels = ids
      .select(col("id"), col("id").as("component"))
      .repartition(shufN, col("id"))
      .localCheckpoint()
    var round = 0
    var moved = 1L
    while (moved > 0) {
      if (round >= maxRounds)
        throw new IllegalStateException(
          s"connectedComponents: no fixpoint after $maxRounds rounds " +
            "(component diameter exceeds the round budget)")
      // symSelf is pre-partitioned on src and labels on id (the join
      // keys) → the join plans no new exchange; the explicit
      // repartition on dst then pins the aggregation's task count.
      val next = symSelf.join(labels, symSelf("src") === labels("id"))
        .repartition(shufN, col("dst"))
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
    // As in connectedComponents: every per-round exchange is pinned to
    // an explicit partition count (REPARTITION_BY_NUM, exempt from
    // AQE's byte-based coalescing) — the per-round parent table is
    // kilobytes, so AQE otherwise folds the CPU-heavy join rounds onto
    // one core.
    val shufN = edges.sparkSession.sessionState.conf.numShufflePartitions
    val symRaw = edges.select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"))
      .union(edges.select(col(dstCol).cast("long").as("u"),
        col(srcCol).cast("long").as("v")))
      .distinct()
    val ids = symRaw.select(col("u").as("id")).distinct()
    // self-loops let ONE edges⋈parent join compute min over
    // {p(u)} ∪ {p(v) : (u,v) ∈ E} with no union of parent-derived
    // branches (duplicate attribute ids across union branches trip
    // constraint propagation); the self-loop row also carries p(u)
    // into the aggregate, so the per-round convergence flag is a
    // column (`prev`) instead of an extra probe join.
    val sym = symRaw
      .union(ids.select(col("id").as("u"), col("id").as("v")))
      .repartition(shufN, col("v"))
      .localCheckpoint()
    // parent(u) = min(u, neighbors(u)) — one propagation for free
    var parent = sym
      .repartition(shufN, col("u"))
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
      val propagated = sym
        .join(parent.repartition(shufN, col("id")),
          sym("v") === col("id"))
        .repartition(shufN, sym("u"))
        .groupBy(sym("u"))
        .agg(min(col("p")).as("p"),
          min(when(col("v") === sym("u"), col("p"))).as("prev"))
        .select(sym("u").as("id"), col("p"), col("prev"))
        .localCheckpoint() // materialized: the jump self-joins it
      // path-halving: point u at min(p(u), p(p(u)))
      val hop = propagated.select(col("id").as("pid"), col("p").as("pp"))
      val next = propagated
        .repartition(shufN, col("p"))
        .join(hop.repartition(shufN, col("pid")), col("p") === col("pid"))
        .select(col("id"), least(col("p"), col("pp")).as("p"),
          col("prev"))
        .localCheckpoint()
      // parents are non-increasing, so "some parent moved this round"
      // (propagation OR halving) is exactly p < prev
      moved = next.where(col("p") < col("prev")).count()
      parent = next.select(col("id"), col("p"))
      round += 1
    }
    parent.select(col("id"), col("p").as("component"))
  }

  /** Fixed-iteration PageRank in EXACT INTEGER arithmetic — every rank
    * is a BIGINT share of `scale` (default parts-per-trillion), each
    * step is r'(v) = (15·scale) div (100·N) + (85·Σ_{u→v} r(u) div
    * deg(u)) div 100 (damping 0.85 as an integer percentage). Why
    * integers: float PageRank sums in-neighbor contributions in
    * whatever order the partial aggregation delivers them, so two runs
    * (or two engines) disagree in the last ulps and rank ties flip;
    * integer sums COMMUTE EXACTLY, making the result bit-reproducible
    * everywhere — the property every other entry in this catalog holds
    * — at the cost of ≤1 unit of truncation per div (≈10⁻¹² of mass
    * per step: irrelevant to ordering, identical in every engine).
    *
    * Contract: `edges` is a DIRECTED edge list; every node must appear
    * as the source of ≥1 edge (no dangling nodes — symmetrize an
    * undirected graph first, which also guarantees in-degree ≥ 1;
    * nodes with no in-edges would be dropped by the contribution
    * join). Iterations are unrolled (`iters` small and fixed — PR on
    * bounded-diameter similarity graphs converges in a few steps; the
    * oracle replays the same unrolled steps as chained CTEs).
    *
    * Scale shape: per iteration, ONE shuffle joining contributions to
    * edges on src and ONE aggregation by dst — both hash-partitioned
    * on node id; the node count rides along as a broadcast 1-row
    * scalar; lineage is truncated per round with localCheckpoint (use
    * reliable checkpoint on a real cluster). */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters out of range: $iters")
    // Explicit partition counts on the per-iteration exchanges — the
    // rank table is kilobytes, so AQE's byte-based coalescing would
    // otherwise fold each iteration's join+aggregate onto one core
    // (the connectedComponents/kcorePeel pathology).
    val shufN = edges.sparkSession.sessionState.conf.numShufflePartitions
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .repartition(shufN, col("src"))
      .localCheckpoint() // consumed once per iteration
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val nDf = broadcast(deg.agg(count(lit(1)).as("n")))
    var pr = deg.crossJoin(nDf)
      .select(col("id"), col("deg"), expr(s"${scale}L div n").as("r"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = e
        .join(pr.select(col("id").as("cid"), expr("r div deg").as("c"))
            .repartition(shufN, col("cid")),
          col("src") === col("cid"))
        .repartition(shufN, col("dst"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
      pr = deg.join(contrib, deg("id") === contrib("dst"))
        .crossJoin(nDf)
        .select(deg("id"), deg("deg"),
          expr(s"(15 * ${scale}L) div (100 * n) + (85 * sc) div 100")
            .as("r"))
        .localCheckpoint()
    }
    pr.select(col("id"), col("deg"), col("r").as("rank"))
  }

  /** Triangle census of an undirected graph — the structural signal a
    * dup-graph diagnostic needs: triangles (and the transitivity ratio
    * 3·T / wedges) distinguish tight near-dup CLIQUES (template spam,
    * mirrored sites) from incidental pairwise overlaps.
    *
    * Algorithm: degree-oriented counting (the MapReduce-standard trick
    * from Suri & Vassilvitskii's "Counting Triangles and the Curse of
    * the Last Reducer"): orient every undirected edge from its
    * (degree, id)-smaller endpoint to the larger, so each triangle is
    * counted EXACTLY once — at its minimum-order vertex — and, the
    * scale point, every vertex's out-degree is O(√|E|) no matter how
    * skewed the raw degree distribution: a celebrity node of degree
    * 10⁶ generates 10¹² wedges under naive per-node pairing but only
    * ~|E| oriented wedges here. Two hash joins on node ids, no
    * per-node quadratic blowup, no driver state.
    *
    * Output: one row — (n_nodes, n_edges, n_triangles, n_wedges,
    * transitivity_ppm) with transitivity = 3·T/wedges in exact
    * integer parts-per-million (`div`, not float division).
    */
  def triangleStats(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("x"), col(dstCol).cast("long").as("y"))
      .where(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()
      .localCheckpoint() // consumed 4x below (degrees, orient, close)
    val deg = e.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // total order key (deg, id): orient each edge small → large
    val withKeys = e
      .join(deg.select(col("id").as("a"), col("deg").as("dega")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("degb")), "b")
    // Explicit partition counts on the self-joins: the oriented edge
    // list is small in BYTES but the wedge expansion is the CPU-heavy
    // part — AQE's byte-based coalescing would fold it onto one core
    // (the connectedComponents/kcorePeel pathology).
    val shufN = edges.sparkSession.sessionState.conf.numShufflePartitions
    val oriented = withKeys.select(
      when(struct(col("dega"), col("a")) < struct(col("degb"), col("b")),
        struct(col("a").as("u"), col("b").as("v"),
          struct(col("degb").as("kd"), col("b").as("ki")).as("kv")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"),
          struct(col("dega").as("kd"), col("a").as("ki")).as("kv"))).as("o"))
      .select(col("o.u").as("u"), col("o.v").as("v"), col("o.kv").as("kv"))
      .repartition(shufN, col("u"))
      .localCheckpoint() // self-joined twice (wedge + close)
    // wedges at the min-order vertex, ordered so each is built once;
    // both sides share oriented's pinned u-partitioning → no exchange
    val o2 = oriented.select(col("u").as("u2"), col("v").as("w"),
      col("kv").as("kw"))
    val wedges = oriented.join(o2,
      col("u") === col("u2") && col("kv") < col("kw"))
      .repartition(shufN, col("v"), col("w"))
    // closing edge is oriented v → w by construction
    val closing = oriented.select(col("u").as("cv"), col("v").as("cw"))
      .repartition(shufN, col("cv"), col("cw"))
    val triangles = wedges.join(closing,
      col("v") === col("cv") && col("w") === col("cw"))
    val nTri = triangles.agg(count(lit(1)).as("n_triangles"))
    val nWedge = deg.agg((sum(col("deg") * (col("deg") - 1)) / 2)
      .cast("long").as("n_wedges"))
    val counts = e.agg(count(lit(1)).as("n_edges"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    nodes.crossJoin(counts).crossJoin(nTri).crossJoin(nWedge)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        col("n_wedges"),
        when(col("n_wedges") === 0, 0L).otherwise(
          expr("(n_triangles * 3000000) div n_wedges"))
          .cast("long").as("transitivity_ppm"))
  }

  /** k-core decomposition by BOUNDED-ROUND peeling: repeatedly drop
    * vertices with fewer than `k` neighbors among the survivors. The
    * round count is FIXED (not run-to-fixpoint) so a SQL oracle can
    * replay the identical unrolled steps as chained CTEs — the
    * `pageRankInt` pattern; a `converged` flag (survivor count
    * unchanged over the last round) rides every output row, so a
    * caller — and the oracle comparison — can see whether the bounded
    * peel reached the true k-core on this graph. Long path-shaped
    * graphs peel one layer per round and may legitimately not
    * converge in `rounds`; both engines then report the same
    * intermediate set and `converged = false`.
    *
    * Scale shape: per round ONE join of the (checkpointed) symmetric
    * edge list against the current survivor set on each endpoint and
    * one degree aggregate — all hash-partitioned on vertex id;
    * lineage truncates per round (reliable checkpoint on a real
    * cluster). Output: (id, deg, converged), deg = degree within the
    * surviving set. Note: if the peel has NOT converged in `rounds`,
    * survivors whose within-set degree drops to 0 in the final round
    * are absent from the output (they produce no row in the last
    * degree aggregate); the SQL oracle replays the same unrolled
    * steps, so both engines omit the same rows. */
  def kcorePeel(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k out of range: $k")
    require(rounds >= 1 && rounds <= 16, s"rounds out of range: $rounds")
    // Explicit partition count on the per-round joins: the survivor
    // set is kilobytes, so AQE's byte-based coalescing folds every
    // round's CPU-heavy join onto one core (observed: 6-round peel at
    // 58 s, single-task stages burning 11 s of solid CPU each); a
    // user-specified partition count is exempt. The src-side probe
    // reuses sym's src partitioning; the dst-side probe necessarily
    // re-exchanges the joined stream on dst each round (the stream is
    // new each round), but its partition count is held at shufN by the
    // pinned alive side.
    val shufN = edges.sparkSession.sessionState.conf.numShufflePartitions
    val sym = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"),
        col(srcCol).cast("long").as("dst")))
      // self-loop / null-id filter AFTER the symmetrizing union: on the
      // forward branch alone, the reversed branch re-adds (a,a) rows
      // (and null ids — `=!=` is null-rejecting on either side), so a
      // self-loop would count toward its own node's degree and a k-1
      // node with a self-loop would survive the peel.
      .where(col("src") =!= col("dst"))
      .distinct()
      .repartition(shufN, col("src"))
      .localCheckpoint() // consumed every round
    def survivorDeg(alive: DataFrame): DataFrame = sym
      .join(alive.repartition(shufN, col("id"))
          .select(col("id").as("sa")),
        col("src") === col("sa"))
      .join(alive.repartition(shufN, col("id"))
          .select(col("id").as("sb")),
        col("dst") === col("sb"))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("deg"))
    var alive = sym.select(col("src").as("id")).distinct().localCheckpoint()
    var prev = alive
    for (_ <- 1 to rounds) {
      prev = alive
      alive = survivorDeg(alive)
        .where(col("deg") >= k)
        .select(col("src").as("id"))
        .localCheckpoint()
    }
    val converged = prev.agg(count(lit(1)).as("n_prev"))
      .crossJoin(alive.agg(count(lit(1)).as("n_last")))
      .select((col("n_prev") === col("n_last")).as("converged"))
    survivorDeg(alive)
      .select(col("src").as("id"), col("deg"))
      .crossJoin(broadcast(converged))
  }

  /** Synchronous LABEL PROPAGATION (Raghavan, Albert & Kumara 2007) —
    * community detection, the fourth member of the graph family
    * (components find CONNECTIVITY, k-core finds DENSITY, PageRank
    * finds CENTRALITY; LPA finds the mesoscale grouping mixture
    * curation wants when one crawl domain is several communities).
    * Every node starts in its own community; each round every node
    * adopts the most frequent label among its NEIGHBORS, ties to the
    * smallest label — the frequency argmax is what separates this
    * from [[connectedComponents]]' min-propagation (min-label floods
    * a whole component; the argmax stops at community boundaries
    * where internal edges outnumber bridges).
    *
    * Determinism: synchronous updates with a fixed round budget and
    * an integer (count DESC, label ASC) argmax — classic LPA's random
    * tie-breaks and vertex orderings are exactly what a reproducible
    * pipeline cannot have, and a bounded synchronous sweep is the
    * standard batch compromise (oscillation on bipartite structures
    * is bounded by the budget and replayed identically by the
    * oracle).
    *
    * Scale shape: per round ONE join of the checkpointed symmetric
    * edge list against the label table and a two-level aggregate —
    * (dst, lbl) counts then per-dst argmax, both riding ONE explicit
    * dst exchange (the second groupBy reuses the first's
    * partitioning); every exchange pinned to an explicit partition
    * count (the kilobyte-table AQE-coalescing pathology of the CC
    * rounds); lineage truncated per round. */
  def labelPropagate(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds out of range: $rounds")
    val shufN = edges.sparkSession.sessionState.conf.numShufflePartitions
    val sym = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"),
        col(srcCol).cast("long").as("dst")))
      // self-loop / null-id filter AFTER the symmetrizing union (same
      // rationale as kcorePeel): filtered on the forward branch alone,
      // the reversed branch re-adds (a,a) rows, and a node would then
      // vote for its OWN label every round — violating the documented
      // among-its-NEIGHBORS rule on graphs with self-loops.
      .where(col("src") =!= col("dst"))
      .distinct()
      .repartition(shufN, col("src"))
      .localCheckpoint() // consumed every round
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
      .repartition(shufN, col("id"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      labels = sym
        .join(labels, col("src") === col("id"))
        .repartition(shufN, col("dst"))
        .groupBy(col("dst"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(min(struct((-col("cnt")).as("nc"), col("lbl"))).as("b"))
        .select(col("dst").as("id"), col("b.lbl").as("lbl"))
        .repartition(shufN, col("id"))
        .localCheckpoint()
    }
    labels
  }
}
