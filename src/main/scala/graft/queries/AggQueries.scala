package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Grouped / ordered aggregations (SURVEY.md §2.4–§2.6).
  *
  * Scale notes (100 TB): every group-by here aggregates with map-side
  * partial aggregation (HashAggregate partial → shuffle by group key →
  * HashAggregate final), so shuffle volume is |groups|, not |rows|. The
  * "latest per key" family uses a single window shuffle on the key —
  * at scale prefer `max_by`-style one-pass aggregation when only one
  * attribute is needed; we use row_number when the whole row is needed
  * (deterministic tie-break included).
  */
object AggQueries {

  /** TPC-H Q1 shape: pricing summary over lineitem with a pushed-down
    * shipdate predicate. Reference analogue: the email-summary scalar
    * aggregates (fetch_transform_load_dag.py:113-136) generalized to
    * grouped form. */
  val q1Agg: CatalogEntry = CatalogEntry(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")), 2).as("sum_charge"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_extendedprice"), 4).as("avg_price"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** `current_rates` semantics (load_to_bigquery.py:98-111): latest row per
    * key, as a whole-table snapshot. One shuffle on the partition key;
    * deterministic tie-break on the unique orderkey. */
  val latestPerKeyAll: CatalogEntry = CatalogEntry(
    "latest_per_key_all",
    """SELECT o_custkey,
      |  o_orderkey AS latest_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS latest_orderdate,
      |  round(o_totalprice, 2) AS latest_totalprice
      |FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY o_custkey
      |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders)
      |WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select(
        $"o_custkey",
        $"o_orderkey".as("latest_orderkey"),
        date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss").as("latest_orderdate"),
        round($"o_totalprice", 2).as("latest_totalprice"))
      .orderBy($"o_custkey")
  }

  /** TPC-H Q3 shape: 3-way join (customer ⋈ orders ⋈ lineitem) with
    * selective filters on both ends, grouped revenue, top-10. Exercises
    * join ordering + filter pushdown through a multi-join; the top-10
    * is TakeOrderedAndProject over the aggregate. */
  val q3Shipping: CatalogEntry = CatalogEntry(
    "q3_shipping_priority",
    """SELECT l_orderkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
      |  o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
      .join(Tables.orders(s, d)
        .filter($"o_orderdate" < lit("1998-01-01").cast("timestamp")),
        $"c_custkey" === $"o_custkey")
      .join(Tables.lineitem(s, d)
        .filter($"l_shipdate" > lit("1998-01-01").cast("timestamp")),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
        .as("revenue"))
      .select($"l_orderkey", $"revenue",
        date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss").as("o_orderdate_s"),
        $"o_orderpriority")
      .orderBy($"revenue".desc, $"l_orderkey".asc)
      .limit(10)
  }

  /** TPC-H Q5 shape: 6-way join with a non-hierarchical condition
    * (supplier must share the customer's nation) — the join-order
    * stress test. Dims broadcast; the fact-side joins are equi-joins
    * AQE re-plans at scale. */
  val q5LocalSupplier: CatalogEntry = CatalogEntry(
    "q5_local_supplier",
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey")
      .join(Tables.lineitem(s, d), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.supplier(s, d)),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
        .as("revenue"))
      .orderBy($"revenue".desc, $"n_name".asc)
  }

  /** TPC-H Q18 shape: aggregate-then-semi-join — large-quantity orders
    * found by a grouped HAVING, then re-joined for customer detail.
    * The HAVING side shuffles only (orderkey, sum) pairs. */
  val q18LargeOrders: CatalogEntry = CatalogEntry(
    "q18_large_orders",
    """WITH big AS (
      |  SELECT l_orderkey, sum(l_quantity) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(l_quantity) > 150)
      |SELECT c_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
      |  round(o_totalprice, 2) AS o_totalprice_r,
      |  round(total_qty, 2) AS total_qty_r
      |FROM big
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice_r DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
    import s.implicits._
    val big = Tables.lineitem(s, d)
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("total_qty"))
      .filter($"total_qty" > 150)
    big.join(Tables.orders(s, d), $"o_orderkey" === $"l_orderkey")
      .join(Tables.customer(s, d), $"c_custkey" === $"o_custkey")
      .select($"c_custkey", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss").as("o_orderdate_s"),
        round($"o_totalprice", 2).as("o_totalprice_r"),
        round($"total_qty", 2).as("total_qty_r"))
      .orderBy($"o_totalprice_r".desc, $"o_orderkey".asc)
      .limit(100)
  }

  /** Per-group least-squares linear fit (slope / intercept / R²) —
    * `regr_slope`-family semantics via EXACT integer moments, the same
    * cross-engine discipline as `stats_agg` / `anomaly_zscore_topk`:
    * aggregate (n, Σx, Σy, Σx², Σy², Σxy) as exact BIGINTs (x = days
    * since 1995-01-01, y = the integral quantity), widen the n·Σ
    * products to Decimal(38,0)/HUGEINT (int64 dies at ~1e11 rows per
    * group — the 100 TB regime), then run the IDENTICAL IEEE double
    * steps in both engines so slope, intercept, and R² are
    * bit-identical before rounding. R²'s squared covariance term
    * (~1e57 at scale) exceeds Decimal(38), so the exact differences
    * narrow to double FIRST and square in double — same op, same
    * result, both engines. One map-side-partial exchange of 6 moments
    * per group; never a second pass over the data (the naive
    * mean-centered formulation scans twice). */
  val aggRegrFit: CatalogEntry = CatalogEntry(
    "agg_regr_fit",
    """WITH pts AS (
      |  SELECT l_returnflag AS flag,
      |    date_diff('day', DATE '1995-01-01', l_shipdate::DATE)::BIGINT AS x,
      |    l_quantity::BIGINT AS y
      |  FROM lineitem),
      |m AS (
      |  SELECT flag, count(*)::BIGINT AS n,
      |    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
      |    sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
      |    sum(x * y)::BIGINT AS sxy
      |  FROM pts GROUP BY flag),
      |f AS (
      |  SELECT flag, n, sx, sy, syy, sxy,
      |    (n::HUGEINT * sxy - sx::HUGEINT * sy)::DOUBLE AS cov_n,
      |    (n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE AS varx_n,
      |    (n::HUGEINT * syy - sy::HUGEINT * sy)::DOUBLE AS vary_n
      |  FROM m)
      |SELECT flag, n,
      |  round(cov_n / varx_n, 8) AS slope,
      |  round((sy::DOUBLE - (cov_n / varx_n) * sx::DOUBLE) / n::DOUBLE, 8)
      |    AS intercept,
      |  round((cov_n * cov_n) / (varx_n * vary_n), 8) AS r2
      |FROM f ORDER BY flag""".stripMargin) { (s, d) =>
    import s.implicits._
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def wide(c: org.apache.spark.sql.Column) = c.cast(dec38)
    val m = Tables.lineitem(s, d)
      .select($"l_returnflag".as("flag"),
        datediff($"l_shipdate".cast("date"), lit("1995-01-01").cast("date"))
          .cast("bigint").as("x"),
        $"l_quantity".cast("bigint").as("y"))
      .groupBy($"flag")
      .agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"),
        sum($"x" * $"y").as("sxy"))
    val covN = (wide($"n") * wide($"sxy") - wide($"sx") * wide($"sy"))
      .cast("double")
    val varxN = (wide($"n") * wide($"sxx") - wide($"sx") * wide($"sx"))
      .cast("double")
    val varyN = (wide($"n") * wide($"syy") - wide($"sy") * wide($"sy"))
      .cast("double")
    m.select($"flag", $"n", $"sx", $"sy",
        covN.as("cov_n"), varxN.as("varx_n"), varyN.as("vary_n"))
      .select($"flag", $"n",
        round($"cov_n" / $"varx_n", 8).as("slope"),
        round(($"sy".cast("double") -
          ($"cov_n" / $"varx_n") * $"sx".cast("double")) /
          $"n".cast("double"), 8).as("intercept"),
        round(($"cov_n" * $"cov_n") / ($"varx_n" * $"vary_n"), 8).as("r2"))
      .orderBy($"flag")
  }

  /** Conditional-aggregate surface (`FILTER` clause / `count_if`):
    * several differently-predicated aggregates in ONE pass over the
    * table — the idiom that replaces N self-joining subqueries with a
    * single scan + single partial-agg exchange (at 100 TB, one pass vs
    * N is the whole game). Spark expresses the filters as
    * `count_if` / `agg(when(cond, x))` — identical null-skipping
    * semantics to ANSI `FILTER`, which the DuckDB oracle uses
    * verbatim. A filtered sum over an empty slice stays NULL in both
    * engines (not zero). */
  val aggFilterClause: CatalogEntry = CatalogEntry(
    "agg_filter_clause",
    """SELECT l_returnflag,
      |  (count(*) FILTER (l_quantity > 25))::BIGINT AS n_heavy,
      |  round(sum(l_extendedprice) FILTER (l_discount > 0.05), 2)
      |    AS rev_discounted,
      |  round(min(l_extendedprice) FILTER (l_tax > 0.04), 2) AS min_taxed,
      |  count(*)::BIGINT AS n
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(count_if($"l_quantity" > 25).as("n_heavy"),
        round(sum(when($"l_discount" > 0.05, $"l_extendedprice")), 2)
          .as("rev_discounted"),
        round(min(when($"l_tax" > 0.04, $"l_extendedprice")), 2)
          .as("min_taxed"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  /** TPC-H Q10 shape (returned-item reporting): which customers drove
    * the most returned revenue in a quarter. Scale shape: the date
    * range prunes orders at the scan (pushed filter), `l_returnflag`
    * prunes lineitem at the scan, nation broadcasts, and the top-20
    * runs as TakeOrderedAndProject — no global sort ever materializes.
    * The group key carries the customer attributes (TPC-H's own
    * formulation) so no second join is needed after the aggregate.
    * Money discipline: revenue is summed in exact 10⁻⁴-dollar BIGINTs
    * (price and discount are 2-decimal, so price·(100−disc%) is an
    * integer) — a double sum flipped a penny between engines at
    * sf0.01, and a rank on a jittery sum can flip the top-20 itself. */
  val q10Returned: CatalogEntry = CatalogEntry(
    "q10_returned_item",
    """SELECT c_custkey, c_name,
      |  round(sum(round(l_extendedprice * 100)::BIGINT *
      |            (100 - round(l_discount * 100)::BIGINT))::BIGINT
      |        / 1e4, 2) AS revenue,
      |  round(c_acctbal, 2) AS acctbal, n_name
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1996-07-01").cast("timestamp")),
        $"c_custkey" === $"o_custkey")
      .join(Tables.lineitem(s, d).filter($"l_returnflag" === "R"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.nation(s, d)),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(sum(round($"l_extendedprice" * 100).cast("bigint") *
        (lit(100L) - round($"l_discount" * 100).cast("bigint")))
        .as("rev_e4"))
      .select($"c_custkey", $"c_name",
        round($"rev_e4" / lit(1e4), 2).as("revenue"),
        round($"c_acctbal", 2).as("acctbal"), $"n_name")
      .orderBy($"revenue".desc, $"c_custkey".asc)
      .limit(20)
  }

  /** TPC-H Q7 shape (volume shipping): bilateral trade between two
    * nations by year — the classic disjunctive join predicate. The
    * nation pair filter is applied to the two broadcast nation dims
    * BEFORE the fact joins, so the big tables are semi-filtered by
    * broadcast hash joins down to the two nations' rows and only
    * those flow into the 3-way fact join; the final aggregate is
    * |pairs|·|years| rows. The disjunction lives in one post-join
    * filter (Catalyst can't split it across joins — keeping the dims
    * pre-filtered to the two nations bounds the blow-up instead).
    * Volume is summed in exact 10⁻⁴-dollar BIGINTs (same money
    * discipline as `q10_returned_item`). */
  val q7Volume: CatalogEntry = CatalogEntry(
    "q7_volume_shipping",
    """SELECT supp_nation, cust_nation, l_year,
      |  round(sum(volume)::BIGINT / 1e4, 2) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    year(l_shipdate)::BIGINT AS l_year,
      |    round(l_extendedprice * 100)::BIGINT *
      |      (100 - round(l_discount * 100)::BIGINT) AS volume
      |  FROM supplier
      |  JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      |) GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, d) =>
    import s.implicits._
    val pair = Seq("NATION_3", "NATION_7")
    val n1 = broadcast(Tables.nation(s, d)
      .filter($"n_name".isin(pair: _*))
      .select($"n_nationkey".as("n1_key"), $"n_name".as("supp_nation")))
    val n2 = broadcast(Tables.nation(s, d)
      .filter($"n_name".isin(pair: _*))
      .select($"n_nationkey".as("n2_key"), $"n_name".as("cust_nation")))
    Tables.supplier(s, d)
      .join(n1, $"s_nationkey" === $"n1_key")
      .join(Tables.lineitem(s, d), $"s_suppkey" === $"l_suppkey")
      .join(Tables.orders(s, d), $"o_orderkey" === $"l_orderkey")
      .join(Tables.customer(s, d), $"c_custkey" === $"o_custkey")
      .join(n2, $"c_nationkey" === $"n2_key")
      .filter(($"supp_nation" === "NATION_3" && $"cust_nation" === "NATION_7") ||
        ($"supp_nation" === "NATION_7" && $"cust_nation" === "NATION_3"))
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").cast("bigint").as("l_year"))
      .agg(sum(round($"l_extendedprice" * 100).cast("bigint") *
        (lit(100L) - round($"l_discount" * 100).cast("bigint")))
        .as("vol_e4"))
      .select($"supp_nation", $"cust_nation", $"l_year",
        round($"vol_e4" / lit(1e4), 2).as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** TPC-H Q6 shape (forecasting revenue change): the pure
    * scan-filter-aggregate — every predicate (shipdate range, discount
    * band, quantity cap) pushes to the parquet scan, so at 100 TB this
    * reads only row groups whose min/max stats overlap 1996 and
    * aggregates map-side to a single row; no shuffle beyond the final
    * 1-row merge. Revenue in exact 10⁻⁴-dollar BIGINTs (price·disc%
    * is an integer — same money discipline as `q10_returned_item`). */
  val q6Forecast: CatalogEntry = CatalogEntry(
    "q6_forecast_revenue",
    """SELECT round(sum(round(l_extendedprice * 100)::BIGINT *
      |              round(l_discount * 100)::BIGINT)::BIGINT / 1e4, 2)
      |         AS revenue,
      |       count(*)::BIGINT AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
      .agg(
        round(sum(round($"l_extendedprice" * 100).cast("bigint") *
          round($"l_discount" * 100).cast("bigint")) / lit(1e4), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q14 shape (promotion effect): monthly ratio of promo-part
    * revenue to all revenue across a fact ⋈ dim join. `part` is the
    * broadcast side (dims stay small relative to facts at every
    * scale); the ratio is a division of two exact-integer sums, so it
    * is correctly rounded and bit-identical cross-engine — ratios are
    * where double summation jitter bites hardest. */
  val q14Promo: CatalogEntry = CatalogEntry(
    "q14_promo_effect",
    """SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS ship_month,
      |  round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
      |          THEN round(l_extendedprice*100)::BIGINT
      |               * (100 - round(l_discount*100)::BIGINT) ELSE 0 END)
      |        / sum(round(l_extendedprice*100)::BIGINT
      |              * (100 - round(l_discount*100)::BIGINT)), 4) AS promo_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import s.implicits._
    val rev = round($"l_extendedprice" * 100).cast("bigint") *
      (lit(100L) - round($"l_discount" * 100).cast("bigint"))
    Tables.lineitem(s, d)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, d)), $"l_partkey" === $"p_partkey")
      .groupBy(date_format(date_trunc("month", $"l_shipdate"), "yyyy-MM")
        .as("ship_month"))
      .agg(round(lit(100.0) *
        sum(when($"p_type".startsWith("PROMO"), rev).otherwise(0L)) /
        sum(rev), 4).as("promo_pct"))
      .orderBy($"ship_month")
  }

  /** TPC-H Q19 shape (discounted revenue, disjunctive predicate): the
    * OR-of-conjunctions join filter that tests predicate handling —
    * the `p_partkey = l_partkey` equi-condition must still drive a
    * hash join (broadcast here), with the brand/size/quantity
    * disjunction evaluated as a post-join filter, NOT a nested-loop
    * over the disjuncts. Per-branch base predicates (size ≥ 1,
    * quantity bounds) are derivable and scan-pushable. */
  val q19Disjunct: CatalogEntry = CatalogEntry(
    "q19_disjunct_revenue",
    """SELECT round(sum(round(l_extendedprice*100)::BIGINT *
      |              (100 - round(l_discount*100)::BIGINT))::BIGINT
      |        / 1e4, 2) AS revenue,
      |       count(*)::BIGINT AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, d) =>
    import s.implicits._
    val branch = ($"p_brand" === "Brand#12" && $"p_size".between(1, 5) &&
        $"l_quantity".between(1, 11)) ||
      ($"p_brand" === "Brand#23" && $"p_size".between(1, 10) &&
        $"l_quantity".between(10, 20)) ||
      ($"p_brand" === "Brand#34" && $"p_size".between(1, 15) &&
        $"l_quantity".between(20, 30))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), $"l_partkey" === $"p_partkey")
      .filter(branch)
      .agg(
        round(sum(round($"l_extendedprice" * 100).cast("bigint") *
          (lit(100L) - round($"l_discount" * 100).cast("bigint"))) /
          lit(1e4), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Weighted median (lower convention): smallest price whose
    * cumulative weight reaches half the total — `percentile(col,
    * 0.5)` can't take a weight column, and physically expanding each
    * row `weight` times (the naive route, and how the spec's
    * brute-force check is phrased) multiplies the shuffle by the mean
    * weight. Shape: per-(group, value) pre-aggregation collapses the
    * fact table to |distinct values| rows FIRST (map-side partial
    * agg), then one window cumsum per group over those collapsed rows.
    * All arithmetic on exact BIGINT weights — no float percentile
    * interpolation to diverge cross-engine; the median itself is a
    * data value, compared exactly. */
  val weightedMedian: CatalogEntry = CatalogEntry(
    "agg_weighted_median",
    """WITH pv AS (
      |  SELECT l_returnflag AS flag, l_extendedprice AS price,
      |         sum(l_quantity)::BIGINT AS w
      |  FROM lineitem GROUP BY 1, 2),
      |cum AS (
      |  SELECT flag, price, w,
      |    sum(w) OVER (PARTITION BY flag ORDER BY price
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
      |    sum(w) OVER (PARTITION BY flag) AS tot
      |  FROM pv)
      |SELECT flag, round(min(price), 2) AS weighted_median,
      |       min(tot)::BIGINT AS total_weight
      |FROM cum WHERE 2*cw >= tot GROUP BY flag ORDER BY flag""".stripMargin) {
    (s, d) =>
    import s.implicits._
    val pv = Tables.lineitem(s, d)
      .groupBy($"l_returnflag".as("flag"), $"l_extendedprice".as("price"))
      .agg(sum($"l_quantity").cast("bigint").as("w"))
    val cumW = Window.partitionBy($"flag").orderBy($"price")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy($"flag")
    pv.withColumn("cw", sum($"w").over(cumW))
      .withColumn("tot", sum($"w").over(totW))
      .where($"cw" * 2 >= $"tot")
      .groupBy($"flag")
      .agg(round(min($"price"), 2).as("weighted_median"),
        min($"tot").as("total_weight"))
      .orderBy($"flag")
  }

  /** Gini concentration coefficient of order value per nation — the
    * inequality/concentration diagnostic (is revenue dominated by a
    * few huge orders?), via the rank formulation G = (2·Σi·xᵢ −
    * (n+1)·Σx) / (n·Σx) over ascending ranks. Exactness: cents are
    * BIGINTs; Σi·x reaches ~9e13 at sf0.1 so the final scaled
    * division runs in DECIMAL(38,0) `div` (Spark IntegralDivide on
    * decimals ≡ DuckDB HUGEINT `//`, both truncating — numerator is
    * provably ≥ 0 so floor = trunc). Rank ties share identical x, so
    * Σi·x is invariant to tie order — the window needs no content
    * tiebreak for determinism (o_orderkey added anyway for plan
    * stability). One window per nation partition, map-side partial
    * agg after. */
  val giniConcentration: CatalogEntry = CatalogEntry(
    "agg_gini_concentration",
    """WITH x AS (
      |  SELECT n_name, round(o_totalprice*100)::BIGINT AS cents,
      |    row_number() OVER (PARTITION BY n_name
      |                       ORDER BY round(o_totalprice*100), o_orderkey)
      |      AS i
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |agg AS (
      |  SELECT n_name, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s,
      |         sum(i * cents)::BIGINT AS si
      |  FROM x GROUP BY 1)
      |SELECT n_name, n,
      |  ((2*si - (n+1)*s)::HUGEINT * 1000000
      |   // (n::HUGEINT * s))::BIGINT AS gini_ppm
      |FROM agg ORDER BY n_name""".stripMargin) { (s, d) =>
    import s.implicits._
    val cents = round($"o_totalprice" * 100).cast("bigint")
    val w = Window.partitionBy($"n_name").orderBy(cents, $"o_orderkey")
    Tables.orders(s, d)
      .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, d)),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name", cents.as("cents"), $"o_orderkey")
      .withColumn("i", row_number().over(
        Window.partitionBy($"n_name").orderBy($"cents", $"o_orderkey"))
        .cast("long"))
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n"), sum($"cents").as("s"),
        sum($"i" * $"cents").as("si"))
      .select($"n_name", $"n",
        expr("""CAST((2*si - (n+1)*s) AS DECIMAL(38,0)) * 1000000
                div (CAST(n AS DECIMAL(38,0)) * s)""").as("gini_ppm"))
      .orderBy($"n_name")
  }

  /** TPC-H Q13 shape (customer order-count distribution): the
    * left-OUTER-preserving histogram — customers with zero qualifying
    * orders must survive as c_count=0, so the exclusion predicate
    * (adapted to this schema: non-LOW priority; the canonical spec's
    * `o_comment NOT LIKE` — this dataset has no comment column) lives
    * in the JOIN CONDITION, not a WHERE (a post-join filter would turn
    * the outer join inner and drop the zero bucket). Two aggregations:
    * per-customer count (shuffle on custkey — orders arrive pre-keyed
    * from the join exchange, so AQE coalesces), then the tiny c_count
    * census. All integer; total ordering via (custdist, c_count). */
  val q13OrderDist: CatalogEntry = CatalogEntry(
    "q13_order_distribution",
    """SELECT c_count, count(*)::BIGINT AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) {
    (s, d) =>
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d),
        $"c_custkey" === $"o_custkey" && $"o_orderpriority" =!= "5-LOW",
        "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  /** TPC-H Q17 shape (small-quantity-order revenue): the correlated
    * per-part average-quantity subquery, decorrelated the way a 100 TB
    * plan wants it — ONE partial-aggregated pass builds (cnt, Σq) per
    * part, joined back on partkey so the brand filter's partkeys drive
    * both probes. The `l_quantity < 0.2·avg` predicate is cleared of
    * floats entirely: quantities are integral, so it is exactly
    * `5·q·cnt < Σq` in BIGINT (no 0.2 rounding hazard). Money output
    * in exact cents; `div 7` ≡ DuckDB `//` on a provably-positive
    * numerator. */
  val q17SmallQty: CatalogEntry = CatalogEntry(
    "q17_small_quantity",
    """WITH pa AS (
      |  SELECT l_partkey AS pk, count(*)::BIGINT AS cnt,
      |         sum(l_quantity::BIGINT)::BIGINT AS sq
      |  FROM lineitem GROUP BY 1)
      |SELECT count(*)::BIGINT AS n_small,
      |  (sum(round(l_extendedprice*100)::BIGINT) // 7)::BIGINT
      |    AS avg_yearly_cents
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |JOIN pa ON pa.pk = l_partkey
      |WHERE p_brand = 'Brand#23'
      |  AND 5 * l_quantity::BIGINT * cnt < sq""".stripMargin) { (s, d) =>
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val perPart = li.groupBy($"l_partkey".as("pk"))
      .agg(count(lit(1)).as("cnt"),
        sum($"l_quantity".cast("bigint")).as("sq"))
    li.join(broadcast(Tables.part(s, d).filter($"p_brand" === "Brand#23")),
        $"p_partkey" === $"l_partkey")
      .join(perPart, $"pk" === $"l_partkey")
      .where(lit(5L) * $"l_quantity".cast("bigint") * $"cnt" < $"sq")
      .agg(count(lit(1)).as("n_small"),
        expr("sum(CAST(round(l_extendedprice*100) AS BIGINT)) div 7")
          .as("avg_yearly_cents"))
  }

  /** TPC-H Q15 shape (top supplier): quarterly per-supplier revenue,
    * then the suppliers achieving the GLOBAL max — the create-view +
    * scalar-subquery form, decorrelated to one partial-aggregated
    * revenue pass reused by both the max probe and the final join (the
    * optimizer reuses the exchange). Revenue in exact price×(100−disc)
    * integer units so the max compare can't sit on a float boundary;
    * ties (several suppliers at the max) all surface, ordered by key. */
  val q15TopSupplier: CatalogEntry = CatalogEntry(
    "q15_top_supplier",
    """WITH rev AS (
      |  SELECT l_suppkey AS sk,
      |    sum(round(l_extendedprice*100)::BIGINT *
      |        (100 - round(l_discount*100)::BIGINT))::BIGINT AS rev_e4
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1),
      |m AS (SELECT max(rev_e4) AS mx FROM rev)
      |SELECT s_suppkey, s_name, rev_e4
      |FROM supplier JOIN rev ON s_suppkey = sk, m
      |WHERE rev_e4 = m.mx ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    import s.implicits._
    val rev = Tables.lineitem(s, d)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey".as("sk"))
      .agg(sum(round($"l_extendedprice" * 100).cast("bigint") *
        (lit(100L) - round($"l_discount" * 100).cast("bigint")))
        .as("rev_e4"))
    val mx = rev.agg(max($"rev_e4").as("mx"))
    rev.crossJoin(broadcast(mx))
      .where($"rev_e4" === $"mx")
      .join(broadcast(Tables.supplier(s, d)), $"s_suppkey" === $"sk")
      .select($"s_suppkey", $"s_name", $"rev_e4")
      .orderBy($"s_suppkey")
  }

  /** TPC-H Q4 shape (order priority checking): the canonical
    * EXISTS-correlated subquery — orders in a quarter having at least
    * one "late" line — planned as a LEFT SEMI join so each order tests
    * membership once regardless of line count. Lateness is adapted to
    * this schema (no l_commitdate/l_receiptdate): a line shipped more
    * than 60 days after the order date. The extra non-equi conjunct
    * rides ON the equi semi-join (orderkey drives the exchange; the
    * date comparison is a post-probe filter), so the plan is one
    * shuffle pair + a tiny 5-group aggregate. The orders-side quarter
    * predicate is pushed to the scan. */
  val q4OrderPriority: CatalogEntry = CatalogEntry(
    "q4_order_priority",
    """SELECT o_orderpriority, count(*)::BIGINT AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.orders(s, d)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
      .join(Tables.lineitem(s, d).select($"l_orderkey", $"l_shipdate"),
        $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  /** TPC-H Q8 shape (national market share): one nation's share of a
    * region's yearly volume in one part type — the two-role nation
    * join (n1 keys the customer's region, n2 names the supplier's
    * nation). Dimension sides (filtered part, nation⋈region,
    * supplier⋈nation) broadcast; the only large shuffles are
    * lineitem⋈orders and orders⋈customer. Share is exact-integer ppm:
    * volumes in price×(100−disc) e4 units, numerator widened to
    * DECIMAL(38,0) before ×10⁶ (a BIGINT numerator would overflow at
    * sf≥1), `div` ≡ DuckDB HUGEINT `//`. */
  val q8MarketShare: CatalogEntry = CatalogEntry(
    "q8_market_share",
    """WITH vol AS (
      |  SELECT year(o_orderdate)::BIGINT AS o_year,
      |    round(l_extendedprice*100)::BIGINT *
      |      (100 - round(l_discount*100)::BIGINT) AS vol_e4,
      |    n2.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  JOIN part ON p_partkey = l_partkey
      |  WHERE r_name = 'ASIA' AND p_type = 'PROMO')
      |SELECT o_year,
      |  (sum(CASE WHEN supp_nation = 'NATION_3' THEN vol_e4 ELSE 0 END)
      |     * 1000000 // sum(vol_e4))::BIGINT AS mkt_share_ppm,
      |  sum(vol_e4)::BIGINT AS total_vol_e4
      |FROM vol GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import s.implicits._
    val custAsia = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)
          .join(Tables.region(s, d).filter($"r_name" === "ASIA"),
            $"n_regionkey" === $"r_regionkey")
          .select($"n_nationkey".as("c_nk"))),
        $"c_nationkey" === $"c_nk")
      .select($"c_custkey")
    val suppNation = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))),
        $"s_nationkey" === $"s_nk")
      .select($"s_suppkey", $"supp_nation")
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter($"p_type" === "PROMO")
          .select($"p_partkey")),
        $"p_partkey" === $"l_partkey")
      .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(custAsia, $"o_custkey" === $"c_custkey", "left_semi")
      .join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
      .select(year($"o_orderdate").cast("bigint").as("o_year"),
        (round($"l_extendedprice" * 100).cast("bigint") *
          (lit(100L) - round($"l_discount" * 100).cast("bigint")))
          .as("vol_e4"),
        $"supp_nation")
      .groupBy($"o_year")
      .agg(
        expr("""CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                        THEN vol_e4 ELSE 0 END) AS DECIMAL(38,0))
                * 1000000 div CAST(sum(vol_e4) AS DECIMAL(38,0))""")
          .as("mkt_share_ppm"),
        sum($"vol_e4").as("total_vol_e4"))
      .orderBy($"o_year")
  }

  /** TPC-H Q12 shape (shipping-mode priority census): join + two
    * conditional counts per group. Adapted to this schema: group by
    * l_returnflag (no l_shipmode), lateness = shipped >30 days after
    * order date (no receipt/commit dates). The year predicate pushes
    * to the lineitem scan; counts are exact integers; the small
    * orders projection (key + priority) keeps the shuffle narrow. */
  val q12PriorityCensus: CatalogEntry = CatalogEntry(
    "q12_priority_census",
    """SELECT l_returnflag,
      |  sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |           THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
      |  sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |           THEN 1 ELSE 0 END)::BIGINT AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import s.implicits._
    val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(s, d)
          .select($"o_orderkey", $"o_orderdate", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAYS"))
      .groupBy($"l_returnflag")
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy($"l_returnflag")
  }

  /** TPC-H Q11 shape (important stock identification, adapted: this
    * schema has no partsupp, so the "value" is supplier account
    * balance by nation): a grouped aggregate kept only where it
    * exceeds a FRACTION OF THE GLOBAL TOTAL — the correlated-HAVING
    * decorrelated to one broadcast 1-row scalar reused by the share
    * projection. The threshold compare is integer cross-multiplication
    * (bal·25 > total), the share exact ppm by integer division; the
    * per-nation aggregate's exchange is reused by the global sum. */
  val supplierValueShare: CatalogEntry = CatalogEntry(
    "q11_value_share",
    """WITH s AS (SELECT n_name,
      |             sum(round(s_acctbal*100)::BIGINT)::BIGINT AS bal_cents
      |           FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |           GROUP BY 1),
      |g AS (SELECT sum(bal_cents)::BIGINT AS total FROM s)
      |SELECT n_name, bal_cents,
      |       (bal_cents * 1000000 // g.total)::BIGINT AS share_ppm
      |FROM s, g WHERE bal_cents * 25 > g.total
      |ORDER BY bal_cents DESC, n_name""".stripMargin) { (s, d) =>
    import s.implicits._
    val perNation = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(sum(round($"s_acctbal" * 100).cast("bigint")).as("bal_cents"))
    val g = perNation.agg(sum($"bal_cents").as("total"))
    perNation.crossJoin(broadcast(g))
      .where($"bal_cents" * 25 > $"total")
      .select($"n_name", $"bal_cents",
        expr("(bal_cents * 1000000) div total").as("share_ppm"))
      .orderBy($"bal_cents".desc, $"n_name")
  }

  /** TPC-H Q9 shape (product-type profit): per-nation per-year profit
    * over a part-name-filtered slice of the fact table. This schema
    * has no `ps_supplycost`, so cost is the part's retail price times
    * quantity — the same five-way star (lineitem ⋈ part ⋈ supplier ⋈
    * nation ⋈ orders) with every money term exact-integer:
    * `price_cents·(100−disc_pct) − retail_cents·100·qty`, summed as
    * BIGINT (DuckDB's HUGEINT sum cast back down; worst case
    * ~1e9/row · 6e9 rows at sf1000 ≈ 6e18 — inside int64 only because
    * the name filter keeps ~1/8 of rows; the `_e4` unit is the widest
    * this sum can afford, documented here deliberately).
    *
    * Scale shape: part (name-filtered) and supplier⋈nation broadcast;
    * the only fact-sized shuffle is lineitem ⋈ orders on orderkey;
    * the (nation, year) aggregate partial-combines map-side to a few
    * hundred groups. */
  val q9ProductProfit: CatalogEntry = CatalogEntry(
    "q9_product_profit",
    """SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
      |  sum(round(l_extendedprice*100)::BIGINT
      |        * (100 - round(l_discount*100)::BIGINT)
      |      - round(p_retailprice*100)::BIGINT * 100
      |        * l_quantity::BIGINT)::BIGINT AS profit_e4
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON o_orderkey = l_orderkey
      |WHERE p_name LIKE '%bolt%'
      |GROUP BY 1, 2
      |ORDER BY nation, o_year DESC""".stripMargin) { (s, d) =>
    import s.implicits._
    val boltParts = Tables.part(s, d)
      .filter($"p_name".contains("bolt"))
      .select($"p_partkey", $"p_retailprice")
    val supNation = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name")
    Tables.lineitem(s, d)
      .join(broadcast(boltParts), $"p_partkey" === $"l_partkey")
      .join(broadcast(supNation), $"s_suppkey" === $"l_suppkey")
      .join(Tables.orders(s, d).select($"o_orderkey", $"o_orderdate"),
        $"o_orderkey" === $"l_orderkey")
      .groupBy($"n_name".as("nation"),
        year($"o_orderdate").cast("bigint").as("o_year"))
      .agg(sum(round($"l_extendedprice" * 100).cast("bigint") *
          (lit(100L) - round($"l_discount" * 100).cast("bigint")) -
          round($"p_retailprice" * 100).cast("bigint") * lit(100L) *
          $"l_quantity".cast("bigint")).as("profit_e4"))
      .orderBy($"nation", $"o_year".desc)
  }

  /** TPC-H Q16 shape (supplier-relationship census): distinct
    * suppliers per (brand, type, size) over an attribute-filtered part
    * slice, excluding a supplier denylist. The part↔supplier relation
    * is derived from lineitem (no `partsupp` here); "complaint"
    * suppliers are adapted to `s_acctbal < 0` — the same NOT-IN
    * exclusion shape, planned as a broadcast LEFT ANTI join (the
    * denylist is tiny by construction; `s_suppkey` is never null, so
    * NOT IN ≡ anti-join with no null-semantics hazard).
    *
    * Scale shape: the filtered part dim broadcasts into the fact scan;
    * COUNT(DISTINCT) over (brand, type, size, suppkey) plans as two
    * hash aggregates with a partial-distinct map side — the shuffle
    * carries deduplicated 4-tuples, not lines. */
  val q16SupplierCensus: CatalogEntry = CatalogEntry(
    "q16_supplier_census",
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#2' AND p_type <> 'ECONOMY'
      |  AND p_size IN (2, 5, 11, 28, 29, 37, 42, 50)
      |  AND l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) {
    (s, d) =>
    import s.implicits._
    val qualPart = Tables.part(s, d)
      .filter($"p_brand" =!= "Brand#2" && $"p_type" =!= "ECONOMY" &&
        $"p_size".isin(2, 5, 11, 28, 29, 37, 42, 50))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    val complaints = Tables.supplier(s, d)
      .filter($"s_acctbal" < 0).select($"s_suppkey")
    Tables.lineitem(s, d)
      .select($"l_partkey", $"l_suppkey")
      .join(broadcast(qualPart), $"p_partkey" === $"l_partkey")
      .join(broadcast(complaints), $"l_suppkey" === $"s_suppkey",
        "left_anti")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  /** SPEARMAN rank correlation between two measures per group — the
    * rank-based association the stats family lacked beside Pearson
    * (`agg_regr_fit`, `stats_corr_matrix`) and the within-series
    * Mann-Kendall trend test: monotone-but-nonlinear relations (price
    * vs quantity) read near ±1 here while Pearson under-reads them,
    * and ranks are outlier-immune. Exact-integer discipline: ranks
    * are VALUE-DETERMINED, never row-identity-determined — rx = rank
    * under lexicographic (x, y) plus the row's index j within its
    * exact-duplicate (x, y) block, ry symmetric under (y, x) with the
    * SAME j — so x-ties break by y (and vice versa) and fully
    * identical rows pair ALIGNED (their d is block-constant),
    * eliminating the cross-engine ambiguity a physical tie-break
    * column cannot (this fixture contains byte-identical duplicate
    * rows; row_number over any column list splits them arbitrarily
    * per engine). rx/ry are then exact permutations of 1..n and the
    * classic 1 − 6·Σd²/(n³−n) formula applies. Σd² can reach n³/3 —
    * past BIGINT at a few million rows per group — so it is
    * accumulated in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB),
    * squared AFTER widening (the BIGINT product itself overflows
    * first at |d| ≳ 3e9), and EMITTED as DOUBLE: the exact-integer
    * contract rides on rho_ppm (one DECIMAL(38,0)/HUGEINT integer
    * division, bit-identical in both engines up to n ≈ 3.6e10 per
    * group — the widest 6e6·Σd² fits 38 digits; past that the
    * lattice path below applies anyway), while sum_d2 is a
    * diagnostic whose exact-int→double conversion is correctly
    * rounded identically in both engines.
    * Degenerate n ≤ 1 groups emit NULL rather than divide by zero.
    *
    * Scale shape: two per-group rank windows (the exact method's
    * inherent sorts — each one exchange on the group key) + ONE
    * partial-agg exchange to |groups| rows. At 100 TB the exact ranks
    * give way to bucketed ranks from the `sketch_quantiles` lattice
    * (rank ≈ cumulative cell count), same downstream algebra. */
  val statsSpearmanRank: CatalogEntry = CatalogEntry(
    "stats_spearman_rank",
    """WITH li AS (SELECT l_returnflag AS g,
      |              round(l_quantity * 100)::BIGINT AS x,
      |              round(l_extendedprice * 100)::BIGINT AS y
      |            FROM lineitem),
      |jj AS (SELECT g, x, y,
      |         row_number() OVER (PARTITION BY g, x, y ORDER BY x)
      |           AS j
      |       FROM li),
      |r AS (SELECT g,
      |        rank() OVER (PARTITION BY g ORDER BY x, y) + j - 1 AS rx,
      |        rank() OVER (PARTITION BY g ORDER BY y, x) + j - 1 AS ry
      |      FROM jj),
      |a AS (SELECT g, count(*)::BIGINT AS n,
      |        sum((rx - ry)::HUGEINT * (rx - ry)) AS sd2
      |      FROM r GROUP BY g)
      |SELECT g AS l_returnflag, n, sd2::DOUBLE AS sum_d2,
      |  CASE WHEN n > 1 THEN
      |    (1000000 - (6000000::HUGEINT * sd2)
      |       // (n::HUGEINT * n * n - n))::BIGINT END AS rho_ppm
      |FROM a ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    import s.implicits._
    spearmanByGroup(Tables.lineitem(s, d).select($"l_returnflag".as("g"),
      round($"l_quantity" * 100).cast("long").as("x"),
      round($"l_extendedprice" * 100).cast("long").as("y")))
      .withColumnRenamed("g", "l_returnflag")
  }

  /** [[statsSpearmanRank]]'s operator over any (g, x, y) frame —
    * extracted so the spec can plant monotone / anti-monotone
    * fixtures. Ranks are value-determined: rank under lexicographic
    * (x, y) (resp. (y, x)) plus the within-(x, y)-block index j,
    * shared by both ranks so identical rows pair aligned; output
    * (g, n, sum_d2, rho_ppm) ordered by g. */
  private[queries] def spearmanByGroup(li: DataFrame): DataFrame = {
    val wj = Window.partitionBy(col("g"), col("x"), col("y"))
      .orderBy(col("x")) // constant within the block: j is 1..m
    val wx = Window.partitionBy(col("g")).orderBy(col("x"), col("y"))
    val wy = Window.partitionBy(col("g")).orderBy(col("y"), col("x"))
    li
      .withColumn("j", row_number().over(wj).cast("long"))
      .withColumn("rx", rank().over(wx).cast("long") + col("j") - 1)
      .withColumn("ry", rank().over(wy).cast("long") + col("j") - 1)
      // widen BEFORE squaring: the Long product (rx-ry)^2 overflows at
      // |d| ~ 3e9 and the Long SUM at ~3e6 rows/group (ADVICE r19) —
      // decimal(38,0) carries both through n ~ 3.6e10
      .withColumn("d", (col("rx") - col("ry")).cast("decimal(38,0)"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("d") * col("d")).as("sd2"))
      .select(col("g"), col("n"),
        col("sd2").cast("double").as("sum_d2"),
        when(col("n") > 1, expr(
          "cast(1000000 - cast(6000000 as decimal(38,0)) * sd2" +
            " div (cast(n as decimal(38,0)) * n * n - n) as bigint)"))
          .as("rho_ppm"))
      .orderBy(col("g"))
  }

  /** LATTICE-RANKED Spearman — the 100 TB path [[statsSpearmanRank]]'s
    * scaladoc names beside both arms so their agreement is measured,
    * not asserted: exact ranks need two per-group SORTS of the raw
    * rows; here each measure buckets into the `sketch_quantiles`
    * log-lattice cell ([[SketchQueries.latIdx]], single-sourced), ranks
    * come from the lattice's cumulative counts as cell MIDRANKS
    * (doubled — r2 = 2·cum_before + cnt + 1 — so they stay on the
    * integer lattice), and rho is Pearson over the midranks (the
    * standard tie treatment: cell-mates are ties). The only event-
    * sized work is ONE (g, ix, iy) partial agg to the sparse JOINT
    * lattice (≤ ~640² cells per group whatever the row count, in
    * practice a few hundred); marginals, midranks and moments are all
    * lattice-metadata arithmetic — mergeable across partitions/days
    * exactly like the quantile lattice itself. Cross-engine float
    * discipline follows `stats_corr_matrix`: every moment is an exact
    * DECIMAL(38,0)/HUGEINT integer, each converted ONCE to double
    * (correctly rounded in both engines), then identical IEEE
    * multiply/subtract/sqrt/divide — n·Σ products stay in double
    * space so no 38-digit ceiling applies at any n. Output: both
    * arms' rho in ppm plus their absolute disagreement and the
    * lattice state sizes; NULL lattice rho on n ≤ 1 or zero variance
    * (a group collapsed into one cell). Positive-domain input, like
    * every lattice entry. */
  val statsSpearmanLattice: CatalogEntry = CatalogEntry(
    "stats_spearman_lattice",
    """WITH li AS (SELECT l_returnflag AS g,
      |              round(l_quantity * 100)::BIGINT AS x,
      |              round(l_extendedprice * 100)::BIGINT AS y
      |            FROM lineitem),
      |jj AS (SELECT g, x, y,
      |         row_number() OVER (PARTITION BY g, x, y ORDER BY x)
      |           AS j
      |       FROM li),
      |r AS (SELECT g,
      |        rank() OVER (PARTITION BY g ORDER BY x, y) + j - 1 AS rx,
      |        rank() OVER (PARTITION BY g ORDER BY y, x) + j - 1 AS ry
      |      FROM jj),
      |a AS (SELECT g, count(*)::BIGINT AS n,
      |        sum((rx - ry)::HUGEINT * (rx - ry)) AS sd2
      |      FROM r GROUP BY g),
      |ex AS (SELECT g, n,
      |         CASE WHEN n > 1 THEN
      |           (1000000 - (6000000::HUGEINT * sd2)
      |              // (n::HUGEINT * n * n - n))::BIGINT END AS rho_ppm
      |       FROM a),
      |cells AS (SELECT g,
      |            CASE WHEN x < 16 THEN x
      |              ELSE 16 * (length(format('{:b}', x)) - 1)
      |                + ((x >> (length(format('{:b}', x)) - 5)) & 15)
      |            END AS ix,
      |            CASE WHEN y < 16 THEN y
      |              ELSE 16 * (length(format('{:b}', y)) - 1)
      |                + ((y >> (length(format('{:b}', y)) - 5)) & 15)
      |            END AS iy
      |          FROM li),
      |joint AS (SELECT g, ix, iy, count(*)::BIGINT AS cnt
      |          FROM cells GROUP BY 1, 2, 3),
      |xl AS (SELECT g, ix, sum(cnt)::BIGINT AS cx
      |       FROM joint GROUP BY 1, 2),
      |xr AS (SELECT g, ix,
      |         2 * sum(cx) OVER (PARTITION BY g ORDER BY ix)
      |           - cx + 1 AS r2x
      |       FROM xl),
      |yl AS (SELECT g, iy, sum(cnt)::BIGINT AS cy
      |       FROM joint GROUP BY 1, 2),
      |yr AS (SELECT g, iy,
      |         2 * sum(cy) OVER (PARTITION BY g ORDER BY iy)
      |           - cy + 1 AS r2y
      |       FROM yl),
      |mm AS (SELECT j.g, sum(j.cnt)::HUGEINT AS n2,
      |         count(DISTINCT j.ix)::BIGINT AS state_cells_x,
      |         count(DISTINCT j.iy)::BIGINT AS state_cells_y,
      |         sum(j.cnt::HUGEINT * xr.r2x) AS sx,
      |         sum(j.cnt::HUGEINT * yr.r2y) AS sy,
      |         sum(j.cnt::HUGEINT * xr.r2x * xr.r2x) AS sxx,
      |         sum(j.cnt::HUGEINT * yr.r2y * yr.r2y) AS syy,
      |         sum(j.cnt::HUGEINT * xr.r2x * yr.r2y) AS sxy
      |       FROM joint j
      |       JOIN xr ON xr.g = j.g AND xr.ix = j.ix
      |       JOIN yr ON yr.g = j.g AND yr.iy = j.iy
      |       GROUP BY j.g),
      |lt AS (SELECT g, state_cells_x, state_cells_y,
      |         CASE WHEN n2 > 1
      |           AND (n2::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
      |             > 0
      |           AND (n2::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)
      |             > 0
      |         THEN round(1000000.0
      |           * (n2::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
      |           / (sqrt(n2::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
      |            * sqrt(n2::DOUBLE * syy::DOUBLE
      |                - sy::DOUBLE * sy::DOUBLE)))::BIGINT
      |         END AS rho_lattice_ppm
      |       FROM mm)
      |SELECT ex.g AS l_returnflag, ex.n, lt.state_cells_x,
      |  lt.state_cells_y, ex.rho_ppm, lt.rho_lattice_ppm,
      |  abs(lt.rho_lattice_ppm - ex.rho_ppm)::BIGINT AS lattice_err_ppm
      |FROM ex JOIN lt ON lt.g = ex.g
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    import s.implicits._
    val li = Tables.lineitem(s, d).select($"l_returnflag".as("g"),
      round($"l_quantity" * 100).cast("long").as("x"),
      round($"l_extendedprice" * 100).cast("long").as("y"))
    val exact = spearmanByGroup(li).select($"g", $"n", $"rho_ppm")
    exact.join(spearmanLatticeByGroup(li), Seq("g"))
      .select($"g".as("l_returnflag"), $"n", $"state_cells_x",
        $"state_cells_y", $"rho_ppm", $"rho_lattice_ppm",
        abs($"rho_lattice_ppm" - $"rho_ppm").as("lattice_err_ppm"))
      .orderBy($"l_returnflag")
  }

  /** [[statsSpearmanLattice]]' lattice arm over any (g, x, y) frame —
    * extracted so the spec can pin the midrank algebra: sub-16 values
    * occupy exact cells, so on TIE-FREE such fixtures the lattice rho
    * matches the exact arm's to the 1-ppm truncation-vs-rounding
    * quantum (the exact arm truncates its integer ppm division; this
    * arm rounds the IEEE ratio). With duplicate rows the two arms
    * follow the two classical tie conventions — the exact arm splits
    * duplicate blocks into aligned distinct ranks (Σd² stays on the
    * permutation lattice), this arm MIDRANKS cell-mates (the Pearson-
    * on-midranks tie treatment) — so they legitimately differ there.
    * Output: (g, state_cells_x, state_cells_y, rho_lattice_ppm). */
  private[queries] def spearmanLatticeByGroup(li: DataFrame): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val cells = li.select(col("g"),
      SketchQueries.latIdx("x").as("ix"),
      SketchQueries.latIdx("y").as("iy"))
    // ONE fact-sized partial agg; everything below is lattice metadata
    val joint = cells.groupBy(col("g"), col("ix"), col("iy"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // three consumers: two marginals + moments
    val wx = Window.partitionBy(col("g")).orderBy(col("ix"))
    val xr = joint.groupBy(col("g"), col("ix"))
      .agg(sum(col("cnt")).as("cx"))
      .select(col("g"), col("ix"),
        (lit(2L) * sum(col("cx")).over(wx) - col("cx") + 1L).as("r2x"))
    val wy = Window.partitionBy(col("g")).orderBy(col("iy"))
    val yr = joint.groupBy(col("g"), col("iy"))
      .agg(sum(col("cnt")).as("cy"))
      .select(col("g"), col("iy"),
        (lit(2L) * sum(col("cy")).over(wy) - col("cy") + 1L).as("r2y"))
    joint.join(xr, Seq("g", "ix")).join(yr, Seq("g", "iy"))
      .groupBy(col("g"))
      .agg(sum(dec(col("cnt"))).as("n2"),
        countDistinct(col("ix")).as("state_cells_x"),
        countDistinct(col("iy")).as("state_cells_y"),
        sum(dec(col("cnt")) * dec(col("r2x"))).as("sx"),
        sum(dec(col("cnt")) * dec(col("r2y"))).as("sy"),
        sum(dec(col("cnt")) * dec(col("r2x")) * dec(col("r2x")))
          .as("sxx"),
        sum(dec(col("cnt")) * dec(col("r2y")) * dec(col("r2y")))
          .as("syy"),
        sum(dec(col("cnt")) * dec(col("r2x")) * dec(col("r2y")))
          .as("sxy"))
      .select(col("g"), col("state_cells_x"), col("state_cells_y"),
        expr("""CASE WHEN n2 > 1
          AND (cast(n2 as double) * cast(sxx as double)
            - cast(sx as double) * cast(sx as double)) > 0
          AND (cast(n2 as double) * cast(syy as double)
            - cast(sy as double) * cast(sy as double)) > 0
        THEN cast(round(1000000.0d
          * (cast(n2 as double) * cast(sxy as double)
            - cast(sx as double) * cast(sy as double))
          / (sqrt(cast(n2 as double) * cast(sxx as double)
              - cast(sx as double) * cast(sx as double))
           * sqrt(cast(n2 as double) * cast(syy as double)
              - cast(sy as double) * cast(sy as double)))) as bigint)
        END""").as("rho_lattice_ppm"))
  }

  def entries: Seq[CatalogEntry] = Seq(
    q1Agg, latestPerKeyAll, q3Shipping, q5LocalSupplier, q18LargeOrders,
    aggRegrFit, aggFilterClause, q10Returned, q7Volume, q6Forecast,
    q14Promo, q19Disjunct, weightedMedian, giniConcentration,
    q13OrderDist, q17SmallQty, q15TopSupplier, q4OrderPriority,
    q8MarketShare, q12PriorityCensus, supplierValueShare,
    q9ProductProfit, q16SupplierCensus, statsSpearmanRank,
    statsSpearmanLattice)
}
