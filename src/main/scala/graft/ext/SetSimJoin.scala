package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT all-pairs set-similarity self-join with PREFIX FILTERING (the
  * AllPairs/PPJoin family, Bayardo et al. WWW'07 / Xiao et al.
  * ICDE'08) — find every pair of rows whose element sets have Jaccard
  * ≥ τ, without the O(n²) pair enumeration AND without the
  * false-negative risk of MinHash banding: this is the exact
  * complement to [[Dedup.nearDupPairs]]'s approximate path.
  *
  * The prefix-filtering theorem: order every set by ONE global total
  * order (here ascending document frequency, then the element itself —
  * rarest first, which makes prefixes maximally selective) and keep
  * each set's first `p = n − ⌈τ·n⌉ + 1` elements. Any two sets with
  * J ≥ τ MUST share at least one prefix element, so the candidate set
  * from an equi-join on prefix elements is a superset of the answer —
  * candidates are then verified exactly.
  *
  * Scale shape: the inverted index is built only over prefixes
  * (rarest elements → smallest postings); the candidate equi-join
  * shuffles on the element; verification is ROW-LOCAL
  * (`array_intersect` on the two sets carried by the candidate row) —
  * never a per-element re-join. The Jaccard test itself is
  * cross-multiplied exact integers (`(tDen+tNum)·overlap ≥
  * tNum·(n_a+n_b)`) — no float ever enters the decision.
  */
object SetSimJoin {

  /** All pairs of `df` rows (identified by integral `idCol`) whose
    * `setCol` (array of DISTINCT strings) Jaccard ≥ tNum/tDen.
    * Returns (id_a, id_b, overlap, n_a, n_b) with id_a < id_b. */
  def selfJoin(df: DataFrame, idCol: String, setCol: String,
      tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen >= tNum,
      s"threshold must be in (0,1]: $tNum/$tDen")
    // Materialize the element arrays ONCE: four sub-plans consume
    // `sets` (the inverted index, the per-set length join, both sides
    // of the verification join), and without a barrier each re-derives
    // the — typically expensive — set-construction expression from the
    // raw input (the repo's known explode-of-expensive-array trap: the
    // r2 minhash was 30x slower from exactly this). localCheckpoint
    // truncates lineage into in-memory blocks; a 100 TB deployment
    // would use a reliable checkpoint / staging table for the same
    // single-materialization shape.
    val sets = df.select(col(idCol).cast("long").as("id"),
        col(setCol).as("arr"))
      .withColumn("n", size(col("arr")).cast("long"))
      .localCheckpoint()
    val tok = sets.select(col("id"), explode(col("arr")).as("el"))
    val dfreq = tok.groupBy(col("el")).agg(count(lit(1)).as("df"))
    val prefixLen =
      col("n") - expr(s"(($tNum * n + ${tDen - 1}) div $tDen)") + 1
    // Prefix rows carry (pos, n) so the self-join can prune with the
    // PPJoin filters (Xiao et al. ICDE'08) BEFORE the distinct:
    //   - length filter: J ≥ τ forces τ·max(n_a,n_b) ≤ min(n_a,n_b);
    //   - positional filter: a pair's FIRST common element (global
    //     order) at positions (pa, pb) bounds the overlap by
    //     1 + min(n_a−pa, n_b−pb) — no common element precedes it. The
    //     equi-join emits one row per shared prefix element; the first
    //     common element's row always survives the filter for a true
    //     pair, so the distinct'd candidate set stays a superset.
    // Hot prefix elements (template shingles kept by a long document's
    // wide prefix) otherwise make the join's intermediate O(df²) —
    // observed 200 CPU-seconds on rows that fit in 3.2 MB.
    val prefix = tok.join(dfreq, "el")
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("df").asc, col("el").asc)))
      .join(sets.select(col("id"), col("n")), "id")
      .where(col("pos") <= prefixLen)
      .select(col("id"), col("el"), col("pos"), col("n"))
    // Explicit partition-count repartition: these stages are CPU-bound
    // at ~60 CPU-s/MB, so AQE's byte-based advisory coalescing (64 MB
    // targets) would fold them onto 1-2 cores; a user-specified
    // partition count is exempt from coalescing. Partitioning keys
    // match the join keys, so no extra exchange is planned after it.
    val shufN = df.sparkSession.sessionState.conf.numShufflePartitions
    val prefixP = prefix.repartition(shufN, col("el"))
    val candRaw = prefixP.as("a")
      .join(prefixP.as("b"),
        col("a.el") === col("b.el") && col("a.id") < col("b.id") &&
          lit(tDen.toLong) * col("a.n") >= lit(tNum.toLong) * col("b.n") &&
          lit(tDen.toLong) * col("b.n") >= lit(tNum.toLong) * col("a.n") &&
          lit((tDen + tNum).toLong) *
            (least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) +
              1) >= lit(tNum.toLong) * (col("a.n") + col("b.n")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val cand = candRaw.repartition(shufN, col("id_a"), col("id_b"))
      .distinct()
    cand
      .join(sets.select(col("id").as("id_a"), col("arr").as("arr_a"),
        col("n").as("n_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("arr").as("arr_b"),
        col("n").as("n_b")), "id_b")
      .withColumn("overlap",
        size(array_intersect(col("arr_a"), col("arr_b"))).cast("long"))
      .where(lit((tDen + tNum).toLong) * col("overlap") >=
        lit(tNum.toLong) * (col("n_a") + col("n_b")))
      .select(col("id_a"), col("id_b"), col("overlap"),
        col("n_a"), col("n_b"))
  }
}
