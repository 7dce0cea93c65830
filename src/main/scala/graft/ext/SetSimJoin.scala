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
    val sets = df.select(col(idCol).cast("long").as("id"),
        col(setCol).as("arr"))
      .withColumn("n", size(col("arr")).cast("long"))
    val tok = sets.select(col("id"), explode(col("arr")).as("el"))
    val dfreq = tok.groupBy(col("el")).agg(count(lit(1)).as("df"))
    val prefixLen =
      col("n") - expr(s"(($tNum * n + ${tDen - 1}) div $tDen)") + 1
    val prefix = tok.join(dfreq, "el")
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("df").asc, col("el").asc)))
      .join(sets.select(col("id"), col("n")), "id")
      .where(col("pos") <= prefixLen)
      .select(col("id"), col("el"))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.el") === col("b.el") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
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
