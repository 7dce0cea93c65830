package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Reshaping / multi-dimensional aggregates (SURVEY.md §2.4/§2.7
  * extensions): cube, pivot (long→wide), unpivot (wide→long), exact
  * percentiles, ordered string aggregation. All plain group-bys under
  * the hood — partial aggregation applies, shuffle volume = |groups|
  * (× grouping-set count for cube).
  */
object ReshapeQueries {

  /** CUBE over (status, priority) with grouping_id disambiguation. */
  val aggCube: CatalogEntry = CatalogEntry(
    "agg_cube",
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*)::BIGINT AS n,
      |  GROUPING(o_orderstatus, o_orderpriority)::INT AS gid
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY gid, status, priority""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.orders(s, d)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), grouping_id().cast("int").as("gid"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n", $"gid")
      .orderBy($"gid", $"status", $"priority")
  }

  /** Pivot long→wide: order counts per priority × status. The oracle is
    * independent conditional aggregation (FILTER), not a pivot. */
  val pivotWide: CatalogEntry = CatalogEntry(
    "pivot_wide",
    """SELECT o_orderpriority,
      |  count(*) FILTER (WHERE o_orderstatus = 'O')::BIGINT AS O,
      |  count(*) FILTER (WHERE o_orderstatus = 'F')::BIGINT AS F,
      |  count(*) FILTER (WHERE o_orderstatus = 'P')::BIGINT AS P
      |FROM orders GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("O", "F", "P"))
      .orderBy($"o_orderpriority")
  }

  /** Unpivot wide→long: the pivoted table melted back to
    * (priority, status, n) — round-trips the pivot above. */
  val unpivotLong: CatalogEntry = CatalogEntry(
    "unpivot_long",
    """SELECT o_orderpriority, o_orderstatus AS status, count(*)::BIGINT AS n
      |FROM orders
      |GROUP BY o_orderpriority, o_orderstatus
      |ORDER BY o_orderpriority, status""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("O", "F", "P"))
      .unpivot(Array($"o_orderpriority"), Array($"O", $"F", $"P"),
        "status", "n")
      .filter($"n" > 0) // statuses absent for a priority don't exist long-form
      .orderBy($"o_orderpriority", $"status")
  }

  /** approx_percentile (KLL-style sketch) next to the exact path: the
    * 100 TB formulation — exact `percentile` buffers every group value
    * in the agg buffer, the sketch is fixed-size and merges map-side.
    * Sketch internals are engine-specific → rows-only here; the
    * sketch-vs-exact error bound is pinned in ApproxPercentileSpec. */
  val aggApproxPercentiles: CatalogEntry = CatalogEntry.noOracle(
    "agg_approx_percentiles") { (s, d) =>
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderstatus")
      .agg(
        percentile_approx($"o_totalprice", lit(0.5), lit(10000))
          .as("median_approx"),
        percentile_approx($"o_totalprice", lit(0.9), lit(10000))
          .as("p90_approx"))
      .orderBy($"o_orderstatus")
  }

  /** Exact interpolated percentiles (median, p90) per group — both
    * engines implement the standard linear-interpolation definition.
    * Scale caveat: buffers per-group values; prefer
    * [[aggApproxPercentiles]] beyond memory-sized groups. */
  val aggPercentiles: CatalogEntry = CatalogEntry(
    "agg_percentiles",
    """SELECT o_orderstatus,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
      |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
      |FROM orders GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderstatus")
      .agg(round(percentile($"o_totalprice", lit(0.5)), 4).as("median_price"),
        round(percentile($"o_totalprice", lit(0.9)), 4).as("p90_price"))
      .orderBy($"o_orderstatus")
  }

  /** Ordered string aggregation: distinct statuses per priority as a
    * sorted comma list (collect_set → sort_array → concat_ws). */
  val aggCollectSorted: CatalogEntry = CatalogEntry(
    "agg_collect_sorted",
    """SELECT o_orderpriority,
      |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
      |FROM orders GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .agg(concat_ws(",", sort_array(collect_set($"o_orderstatus")))
        .as("statuses"))
      .orderBy($"o_orderpriority")
  }

  /** Quantile bucketing: ntile(4) over (o_totalprice, o_orderkey) — the
    * unique tie-break makes bucket assignment deterministic, so the
    * bucket boundary stats get a full oracle. The plan is one global
    * sort (inherent to exact ntile); the approx path at 100 TB is
    * `agg_approx_percentiles` cut points + a narrow bucket join. */
  val ntileBuckets: CatalogEntry = CatalogEntry(
    "ntile_buckets",
    """SELECT bucket::INT AS bucket, count(*)::BIGINT AS n,
      |  round(min(o_totalprice), 2) AS min_price,
      |  round(max(o_totalprice), 2) AS max_price
      |FROM (
      |  SELECT o_totalprice,
      |    ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      |  FROM orders)
      |GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"o_totalprice".asc, $"o_orderkey".asc)
    Tables.orders(s, d)
      .select($"o_totalprice", ntile(4).over(w).as("bucket"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        round(min($"o_totalprice"), 2).as("min_price"),
        round(max($"o_totalprice"), 2).as("max_price"))
      .orderBy($"bucket")
  }

  /** percent_rank / cume_dist over a unique total order — distribution
    * position per order. The ranks are exact integer ratios
    * (k/(n-1), k/n), bit-identical across engines before rounding. */
  val rankDistribution: CatalogEntry = CatalogEntry(
    "rank_distribution",
    """SELECT o_orderkey,
      |  round(percent_rank() OVER w, 6) AS pct_rank_r,
      |  round(cume_dist() OVER w, 6) AS cume_dist_r
      |FROM orders
      |WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey LIMIT 1000""".stripMargin) { (s, d) =>
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"o_totalprice".asc, $"o_orderkey".asc)
    Tables.orders(s, d)
      .select($"o_orderkey",
        round(percent_rank().over(w), 6).as("pct_rank_r"),
        round(cume_dist().over(w), 6).as("cume_dist_r"))
      .orderBy($"o_orderkey")
      .limit(1000)
  }

  def entries: Seq[CatalogEntry] = Seq(
    aggCube, pivotWide, unpivotLong, aggPercentiles, aggApproxPercentiles,
    aggCollectSorted, ntileBuckets, rankDistribution)
}
