package graft

/** Catalog-wide scale-killer lint: NO entry may plan a CartesianProduct,
  * and BroadcastNestedLoopJoin is allowed only where the build side is a
  * broadcast 1-row scalar / single query vector (the documented
  * pattern) — enumerated here so any future entry that accidentally
  * introduces an all-pairs join fails this suite instead of surviving
  * until a 100 TB run.
  */
class CatalogPlanLintSpec extends SparkTestBase {

  /** Entries whose plan legitimately carries a BroadcastNestedLoopJoin:
    * every one is a crossJoin against a broadcast ≤1-row aggregate or a
    * single query vector — O(n) work, not O(n²). */
  private val scalarBroadcastAllowlist = Set(
    "earliest_in_window",    // broadcast data-max "now" scalar
    "dedup_ngram_jaccard",   // broadcast 1 query shingle-set
    "tfidf_top_terms",       // broadcast 1-row corpus count N
    "resample_ffill",        // broadcast (min_day, max_day) bounds row
    "sim_cosine_topk",       // broadcast 1 query embedding
    "sim_ivf",               // centroid table (|clusters| rows) x 1 query row
    "events_grouping_sets")  // grouping-sets expand over broadcast scalar

  test("no catalog entry plans a cartesian product; nested-loop joins " +
      "only against broadcast scalars") {
    val sf = "/root/testdata/sf0.001"
    val violations = SparkEntry.catalog.toSeq.sortBy(_._1).flatMap {
      case (name, entry) =>
        val plan = entry.query(spark, sf).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
          !scalarBroadcastAllowlist(name)
        if (cartesian) Some(s"$name: CartesianProduct")
        else if (bnlj) Some(s"$name: unexpected BroadcastNestedLoopJoin")
        else None
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }
}
