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
    // I/O DIET (r19 verdict item 3 — the CC entries were the catalog's
    // heaviest per-round block movers). Three cuts, multiplicative:
    //
    //  1. ADJACENCY COMPRESSION: the edge store checkpointed once and
    //     consumed every round is one row per NODE — (src, array of
    //     neighbors) — not one row per directed edge. The same
    //     adjacency costs ~half the block bytes (each src id stored
    //     once, array elements pack densely in the UnsafeRow) and the
    //     per-round probe scans node-count rows instead of edge-count.
    //
    //  2. DELTA PROPAGATION: only nodes whose label CHANGED last round
    //     re-offer it (round 1: everyone offers their own id). Labels
    //     are non-increasing and every change is re-offered next
    //     round, so at fixpoint every edge has seen both endpoints'
    //     final labels — the classic delta-iteration argument. For
    //     near-dup graphs the frontier collapses after round 1-2, so
    //     the per-round message exchange shrinks from edge-sized to
    //     frontier-sized — the GBs-per-iteration the r19 stall
    //     evidence charged to this operator mostly disappear.
    //
    //  3. FRONTIER BROADCAST: once the frontier (`moved` from the
    //     previous round's convergence count — already paid for) is
    //     small, it broadcasts into the propagation join, so no
    //     shuffle of anything edge-shaped remains at all.
    //
    // Every remaining per-round exchange still carries a USER-
    // SPECIFIED partition count (REPARTITION_BY_NUM, exempt from AQE
    // coalescing): these tables are small in BYTES but CPU-heavy, and
    // AQE's byte-based coalescing otherwise folds each round onto ONE
    // core — observed in the round-10 bench as 87 s and 368 s
    // single-task stages inside dedup_cluster_cc.
    val shufN = edges.sparkSession.sessionState.conf.numShufflePartitions
    val sym = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"),
        col(srcCol).cast("long").as("dst")))
      .distinct()
    // checkpointed ONCE: the (often expensive) pair-generation plan
    // feeding this operator must not re-execute per round
    val adj = sym.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("ns"))
      .repartition(shufN, col("src"))
      .localCheckpoint()
    var labels = adj
      .select(col("src").as("id"), col("src").as("component"))
      .repartition(shufN, col("id"))
      .localCheckpoint()
    var active = labels // round 1: every node offers its own id
    var moved = -1L // unknown until a round has counted its frontier
    var round = 0
    while (moved != 0L) {
      if (round >= maxRounds)
        throw new IllegalStateException(
          s"connectedComponents: no fixpoint after $maxRounds rounds " +
            "(component diameter exceeds the round budget)")
      val actS = active
        .select(col("id").as("aid"), col("component").as("ac"))
      // 8 MB/1M-row frontier: comfortably inside driver/executor
      // memory; round 1 (frontier size unknown = whole graph) never
      // broadcasts
      val act =
        if (moved >= 0L && moved <= 1000000L) broadcast(actS) else actS
      // adj is pre-partitioned on src (the join key) → the non-
      // broadcast join plans no new exchange on the big side; only
      // the exploded frontier-sized message stream re-exchanges.
      val msgs = adj.join(act, col("src") === col("aid"))
        .select(explode(col("ns")).as("id"), col("ac"))
        .repartition(shufN, col("id"))
        .groupBy(col("id"))
        .agg(min(col("ac")).as("cand"))
      // labels and msgs are both id-partitioned → exchange-free join;
      // `changed` compares against the pre-round label, so the count
      // below is the convergence probe AND next round's frontier size
      val next = labels.join(msgs, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("cand"), col("component")))
            .as("component"),
          (coalesce(col("cand"), col("component")) < col("component"))
            .as("changed"))
        .localCheckpoint()
      moved = next.where(col("changed")).count()
      active = next.where(col("changed"))
        .select(col("id"), col("component"))
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
    // ADJACENCY-COMPRESSED edge store (r19 verdict item 3, same diet
    // as [[connectedComponents]]): one row per node keyed by v with
    // its neighbor array — checkpointed once so the pair-generation
    // plan never re-executes, at ~half the block bytes of the flat
    // edge rows plus their self-loop augmentation (the old self-loop
    // trick is replaced by an exchange-free post-aggregate join:
    // parent is id-partitioned, the message aggregate is u-keyed on
    // the same hash — `least(prev, mn)` does what the self-loop row
    // smuggled into the aggregate).
    val adjV = symRaw.groupBy(col("v"))
      .agg(collect_list(col("u")).as("us"))
      .repartition(shufN, col("v"))
      .localCheckpoint()
    // parent(u) = min(u, neighbors(u)) — one propagation for free;
    // derived from adjV (array_min over the compressed row), not from
    // a second execution of the edge plan
    var parent = adjV
      .select(col("v").as("id"),
        least(col("v"), array_min(col("us"))).as("p"))
      .repartition(shufN, col("id"))
      .localCheckpoint()
    var round = 0
    var moved = 1L
    while (moved > 0) {
      if (round >= maxRounds)
        throw new IllegalStateException(
          s"connectedComponentsStar: no fixpoint after $maxRounds rounds")
      // v-keyed adjacency against id-partitioned parent → exchange-
      // free big-side join; only the exploded message stream (and the
      // halving hop below) re-exchange
      val msgs = adjV
        .join(parent.repartition(shufN, col("id")),
          col("v") === col("id"))
        .select(explode(col("us")).as("mu"), col("p").as("np"))
        .repartition(shufN, col("mu"))
        .groupBy(col("mu"))
        .agg(min(col("np")).as("mn"))
      val propagated = parent.repartition(shufN, col("id"))
        .join(msgs, col("id") === col("mu"), "left")
        .select(col("id"),
          least(col("p"), coalesce(col("mn"), col("p"))).as("p"),
          col("p").as("prev"))
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
