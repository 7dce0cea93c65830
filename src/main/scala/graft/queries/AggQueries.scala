package graft.queries

import org.apache.spark.sql.SparkSession
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

  def entries: Seq[CatalogEntry] = Seq(
    q1Agg, latestPerKeyAll, q3Shipping, q5LocalSupplier, q18LargeOrders)
}
