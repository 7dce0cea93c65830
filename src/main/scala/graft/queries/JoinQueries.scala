package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Join / set-op / grouped-aggregate extensions (SURVEY.md §2.3, §2.7,
  * plus the §2.4 extension aggregates). The reference's only join is the
  * MERGE upsert (RateQueries.mergeUpsert); these exercise the join
  * strategies a 100 TB deployment leans on.
  *
  * Scale notes: dimension joins broadcast explicitly (`broadcast()`) —
  * a 5-row region table must never shuffle the fact side; the
  * lineitem⋈orders join is an equi-join on the natural key, so at scale
  * it's a shuffle/sort-merge join AQE can re-plan (and co-locating both
  * tables bucketed by orderkey removes the shuffle entirely); semi/anti
  * forms never materialize the probe side's payload.
  */
object JoinQueries {

  /** Broadcast dimension join: customer ⋈ nation ⋈ region rolled up to
    * region/nation counts. Both dims are broadcast — zero fact shuffle
    * before the aggregation. */
  val joinBroadcastDim: CatalogEntry = CatalogEntry(
    "join_broadcast_dim",
    """SELECT r_name, n_name,
      |  count(*)::BIGINT AS n_customers,
      |  round(sum(c_acctbal), 2) AS sum_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"),
        round(sum($"c_acctbal"), 2).as("sum_acctbal"))
      .orderBy($"r_name", $"n_name")
  }

  /** Large equi-join lineitem ⋈ orders aggregated by priority. Partial
    * aggregation runs before the exchange, so shuffle volume after the
    * join is |groups|. */
  val joinLargeAgg: CatalogEntry = CatalogEntry(
    "join_large_agg",
    """SELECT o_orderpriority,
      |  count(*)::BIGINT AS n_lines,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .orderBy($"o_orderpriority")
  }

  /** Left semi: orders having at least one high-quantity line. The probe
    * side's payload never crosses the exchange. */
  val joinSemi: CatalogEntry = CatalogEntry(
    "join_semi",
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice_r
      |FROM orders
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d).filter($"l_quantity" >= 49),
        $"o_orderkey" === $"l_orderkey", "left_semi")
      .select($"o_orderkey", $"o_custkey",
        round($"o_totalprice", 2).as("o_totalprice_r"))
      .orderBy($"o_orderkey")
  }

  /** Left anti: customers with no pending order. */
  val joinAnti: CatalogEntry = CatalogEntry(
    "join_anti",
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter($"o_orderstatus" === "P"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** TPC-H Q22 shape (global-sales opportunity): rich-but-lapsed
    * customers — balance above the positive-balance average, with no
    * URGENT order (adapted: this schema has no phone column, and every
    * customer here has SOME order, so the anti-join predicate is the
    * priority slice, keeping the anti join non-vacuous). The global
    * average is ONE broadcast scalar row (never a per-row subquery);
    * the anti join broadcasts the URGENT custkey side when small and
    * shuffles cleanly when not. Money in exact cents; the average
    * itself is exact-integer `div` so the threshold compare cannot sit
    * on a float boundary. */
  val q22GlobalSales: CatalogEntry = CatalogEntry(
    "q22_global_sales",
    """WITH pos AS (
      |  SELECT c_custkey, c_nationkey,
      |         round(c_acctbal*100)::BIGINT AS bal_cents
      |  FROM customer WHERE c_acctbal > 0.0),
      |avgbal AS (SELECT (sum(bal_cents) // count(*))::BIGINT AS ab FROM pos)
      |SELECT n_name, count(*)::BIGINT AS numcust,
      |  sum(c.bal_cents)::BIGINT AS totacctbal_cents
      |FROM pos c JOIN nation ON c_nationkey = n_nationkey, avgbal
      |WHERE c.bal_cents > avgbal.ab
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderpriority = '1-URGENT')
      |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
    import s.implicits._
    val pos = Tables.customer(s, d).filter($"c_acctbal" > 0.0)
      .select($"c_custkey", $"c_nationkey",
        round($"c_acctbal" * 100).cast("bigint").as("bal_cents"))
    val avgbal = pos.agg(
      expr("sum(bal_cents) div count(*)").cast("bigint").as("ab"))
    pos.crossJoin(broadcast(avgbal))
      .where($"bal_cents" > $"ab")
      .join(Tables.orders(s, d)
          .filter($"o_orderpriority" === "1-URGENT")
          .select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .join(broadcast(Tables.nation(s, d)),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("numcust"), sum($"bal_cents").as("totacctbal_cents"))
      .orderBy($"n_name")
  }

  private def custkeysByStatus(s: org.apache.spark.sql.SparkSession,
      d: String, status: String) = {
    import s.implicits._
    Tables.orders(s, d).filter($"o_orderstatus" === status)
      .select($"o_custkey")
  }

  /** UNION (set semantics): customers with an open or finished order. */
  val setUnion: CatalogEntry = CatalogEntry(
    "set_union",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |UNION
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    import s.implicits._
    custkeysByStatus(s, d, "O").union(custkeysByStatus(s, d, "F"))
      .distinct()
      .orderBy($"o_custkey")
  }

  /** INTERSECT: customers with both an open and a finished order. */
  val setIntersect: CatalogEntry = CatalogEntry(
    "set_intersect",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    import s.implicits._
    custkeysByStatus(s, d, "O").intersect(custkeysByStatus(s, d, "F"))
      .orderBy($"o_custkey")
  }

  /** EXCEPT: customers with an open order but no finished one. */
  val setExcept: CatalogEntry = CatalogEntry(
    "set_except",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    import s.implicits._
    custkeysByStatus(s, d, "O").except(custkeysByStatus(s, d, "F"))
      .orderBy($"o_custkey")
  }

  /** Exact distinct count per group (§2.4 extension). */
  val aggDistinctCount: CatalogEntry = CatalogEntry(
    "agg_distinct_count",
    """SELECT o_orderstatus,
      |  count(*)::BIGINT AS n_orders,
      |  count(DISTINCT o_custkey)::BIGINT AS n_customers
      |FROM orders GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct($"o_custkey").as("n_customers"))
      .orderBy($"o_orderstatus")
  }

  /** HLL sketch distinct (the 100 TB path for distinct counts — constant
    * memory, one pass, mergeable). Sketch internals differ between
    * engines, so no SQL oracle; the HLL-vs-exact error bound is asserted
    * in ApproxDistinctSpec. */
  val aggApproxDistinct: CatalogEntry = CatalogEntry.noOracle(
    "agg_approx_distinct") { (s, d) =>
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderstatus")
      .agg(approx_count_distinct($"o_custkey", 0.02).as("approx_customers"))
      .orderBy($"o_orderstatus")
  }

  /** ROLLUP over the region/nation hierarchy with grouping_id; names
    * coalesced so the output carries no ambiguous nulls. */
  val aggRollup: CatalogEntry = CatalogEntry(
    "agg_rollup",
    """SELECT coalesce(r_name, 'ALL') AS region,
      |  coalesce(n_name, 'ALL') AS nation,
      |  count(*)::BIGINT AS n_customers,
      |  GROUPING(r_name, n_name)::INT AS gid
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY gid, region, nation""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"),
        grouping_id().cast("int").as("gid"))
      .select(coalesce($"r_name", lit("ALL")).as("region"),
        coalesce($"n_name", lit("ALL")).as("nation"),
        $"n_customers", $"gid")
      .orderBy($"gid", $"region", $"nation")
  }

  /** The reference's hard-coded symbols dimension (app.py:61-73) as a
    * literal broadcast dim joined to facts. */
  val dimLiteralJoin: CatalogEntry = CatalogEntry(
    "dim_literal_join",
    """SELECT t.status_label,
      |  count(*)::BIGINT AS n,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders o
      |JOIN (VALUES ('O', 'open'), ('F', 'finished'), ('P', 'pending'))
      |  t(status, status_label) ON o.o_orderstatus = t.status
      |GROUP BY t.status_label
      |ORDER BY t.status_label""".stripMargin) { (s, d) =>
    import s.implicits._
    val dim = Seq(("O", "open"), ("F", "finished"), ("P", "pending"))
      .toDF("status", "status_label")
    Tables.orders(s, d)
      .join(broadcast(dim), $"o_orderstatus" === $"status")
      .groupBy($"status_label")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
      .orderBy($"status_label")
  }

  /** FULL OUTER join of two daily aggregates (orders placed vs items
    * shipped) — 102 of the days exist on only one side at sf0.01, so
    * both null fill directions are exercised. Both sides pre-aggregate
    * before the join: the outer join shuffles |days| rows, not
    * |orders|+|lineitem|. */
  val joinFullOuter: CatalogEntry = CatalogEntry(
    "join_full_outer",
    """WITH o AS (
      |  SELECT o_orderdate::TIMESTAMP::DATE AS day,
      |    count(*)::BIGINT AS n_orders
      |  FROM orders GROUP BY day),
      |l AS (
      |  SELECT l_shipdate::TIMESTAMP::DATE AS day,
      |    count(*)::BIGINT AS n_ships
      |  FROM lineitem GROUP BY day)
      |SELECT strftime(coalesce(o.day, l.day), '%Y-%m-%d') AS day_s,
      |  o.n_orders, l.n_ships
      |FROM o FULL OUTER JOIN l ON o.day = l.day
      |ORDER BY day_s""".stripMargin) { (s, d) =>
    import s.implicits._
    val o = Tables.orders(s, d)
      .groupBy(to_date($"o_orderdate").as("o_day"))
      .agg(count(lit(1)).as("n_orders"))
    val l = Tables.lineitem(s, d)
      .groupBy(to_date($"l_shipdate").as("l_day"))
      .agg(count(lit(1)).as("n_ships"))
    o.join(l, $"o_day" === $"l_day", "full_outer")
      .select(date_format(coalesce($"o_day", $"l_day"), "yyyy-MM-dd")
        .as("day_s"), $"n_orders", $"n_ships")
      .orderBy($"day_s")
  }

  /** SQL-surface subqueries (`spark.sql`): EXISTS → left semi, scalar
    * subquery → broadcast scalar. The engine's SQL face over the same
    * tables, oracled against DuckDB running the very same statement
    * shape. */
  val sqlExistsSubquery: CatalogEntry = CatalogEntry(
    "sql_exists_subquery",
    """SELECT o_orderpriority, count(*)::BIGINT AS n_with_big_item
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
      |  AND o.o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("graft_sql_orders")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_sql_lineitem")
    s.sql("""
      SELECT o_orderpriority, count(1) AS n_with_big_item
      FROM graft_sql_orders o
      WHERE EXISTS (
        SELECT 1 FROM graft_sql_lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
        AND o.o_totalprice > (SELECT avg(o_totalprice) FROM graft_sql_orders)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  }

  /** Fuzzy (approximate-string) self-join — entity-resolution style:
    * pairs of part-name vocabulary words within Levenshtein distance 3,
    * found WITHOUT an all-pairs comparison. Standard ER blocking: an
    * equi-join on a cheap block key (first character) bounds the
    * candidate set; a length-difference band (|len a − len b| ≤ 3, a
    * necessary condition for edit distance ≤ 3) prunes inside the
    * block; the exact `levenshtein` confirm runs only on survivors.
    * Blocking trades recall for scale — a pair whose FIRST letter
    * differs is missed by construction (the classic blocking bargain;
    * multi-pass blocking on different keys recovers it) — and the
    * oracle mirrors the same blocking so the contract is explicit.
    * At 100 TB the block key becomes (prefix, length bucket) and each
    * block is one AQE-sized shuffle partition; no cross join exists in
    * the plan (the lint forbids CartesianProduct globally). */
  val fuzzyJoinLevenshtein: CatalogEntry = CatalogEntry(
    "fuzzy_join_levenshtein",
    """WITH w AS (
      |  SELECT DISTINCT unnest(string_split(p_name, ' ')) AS w FROM part),
      |b AS (SELECT w, substring(w, 1, 1) AS blk FROM w)
      |SELECT a.w AS w_a, b2.w AS w_b,
      |  levenshtein(a.w, b2.w)::BIGINT AS dist
      |FROM b a JOIN b b2 ON a.blk = b2.blk AND a.w < b2.w
      |  AND abs(length(a.w) - length(b2.w)) <= 3
      |WHERE levenshtein(a.w, b2.w) <= 3
      |ORDER BY w_a, w_b""".stripMargin) { (s, d) =>
    import s.implicits._
    val words = Tables.part(s, d)
      .select(explode(split($"p_name", " ")).as("w"))
      .distinct()
      .select($"w", substring($"w", 1, 1).as("blk"))
    words.as("a").join(words.as("b"),
        $"a.blk" === $"b.blk" && $"a.w" < $"b.w" &&
          abs(length($"a.w") - length($"b.w")) <= 3)
      .select($"a.w".as("w_a"), $"b.w".as("w_b"),
        levenshtein($"a.w", $"b.w").cast("long").as("dist"))
      .where($"dist" <= 3)
      .orderBy($"w_a", $"w_b")
  }

  /** Spell-correction / entity-resolution by Jaro–Winkler argmax: each
    * deterministically "typo'd" part name (one char deleted at an
    * md5-derived position) is matched back to the clean name
    * vocabulary — the fuzzy-dedup step of record linkage. Uses the
    * NATIVE codegen'd `jaro_winkler` expression
    * ([[graft.functions.JaroWinkler]]), pinned bit-exactly to DuckDB's
    * `jaro_winkler_similarity`, so the oracle checks the similarity
    * VALUES, not just membership. Blocking: first-char equality plus a
    * ±2 length band bound the candidate set (the blocking bargain —
    * a typo deleting char 1 is unrecoverable by construction and the
    * oracle mirrors that); per-typo argmax via one row_number window;
    * ties broken on candidate asc (none exist in this data, checked).
    * At 100 TB: vocabulary side broadcasts (dictionaries are small),
    * typo side streams — no shuffle beyond the argmax window on the
    * bounded candidate pairs. */
  val fuzzyCorrectJaroWinkler: CatalogEntry = CatalogEntry(
    "fuzzy_correct_jaro_winkler",
    """WITH names AS (SELECT DISTINCT p_name AS w FROM part),
      |typos AS (
      |  SELECT w AS orig,
      |    concat(substring(w, 1, pos-1), substring(w, pos+1)) AS typo
      |  FROM (SELECT w,
      |          (('0x' || substring(md5(w),1,15))::BIGINT
      |           % length(w))::INT + 1 AS pos
      |        FROM names)),
      |cand AS (
      |  SELECT t.typo, t.orig, n.w AS cand,
      |         jaro_winkler_similarity(t.typo, n.w) AS jw
      |  FROM typos t JOIN names n
      |    ON substring(t.typo,1,1) = substring(n.w,1,1)
      |   AND abs(length(t.typo) - length(n.w)) <= 2),
      |best AS (
      |  SELECT typo, orig, cand, jw,
      |    row_number() OVER (PARTITION BY typo
      |                       ORDER BY jw DESC, cand) AS rn
      |  FROM cand)
      |SELECT typo, orig, cand AS corrected, round(jw, 4) AS jw,
      |  (cand = orig) AS recovered
      |FROM best WHERE rn = 1 AND jw >= 0.8
      |ORDER BY typo""".stripMargin) { (s, d) =>
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val names = Tables.part(s, d).select($"p_name".as("w")).distinct()
    val typos = names
      .withColumn("pos", (conv(substring(md5($"w"), 1, 15), 16, 10)
        .cast("long") % length($"w")).cast("int") + 1)
      .select($"w".as("orig"),
        concat(substring($"w", lit(1), $"pos" - 1),
          $"w".substr($"pos" + 1, length($"w"))).as("typo"))
    val cand = typos.as("t")
      .join(names.as("n"),
        substring($"t.typo", 1, 1) === substring($"n.w", 1, 1) &&
          abs(length($"t.typo") - length($"n.w")) <= 2)
      .select($"t.typo", $"t.orig", $"n.w".as("cand"),
        call_function("jaro_winkler", $"t.typo", $"n.w").as("jw"))
    val w = Window.partitionBy($"typo").orderBy($"jw".desc, $"cand".asc)
    cand.withColumn("rn", row_number().over(w))
      .where($"rn" === 1 && $"jw" >= 0.8)
      .select($"typo", $"orig", $"cand".as("corrected"),
        round($"jw", 4).as("jw"), ($"cand" === $"orig").as("recovered"))
      .orderBy($"typo")
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): the doubly
    * correlated EXISTS / NOT-EXISTS — late lines in multi-supplier
    * finished orders where the line's supplier was the ONLY late one.
    * Decorrelated for scale: ONE per-order aggregate computes
    * (distinct suppliers, distinct late suppliers); a late line
    * qualifies iff ns ≥ 2 ∧ nls = 1 — set-equal to the canonical
    * "exists another supplier's line, not exists another supplier's
    * late line" (proven equivalent against the EXISTS formulation the
    * oracle states directly). Both the aggregate and the join back
    * shuffle on orderkey, so the exchange is planned once and reused;
    * lateness (no commit/receipt dates in this schema) = shipped >90
    * days after order date; the supplier name join broadcasts. */
  val q21WaitingSupplier: CatalogEntry = CatalogEntry(
    "q21_waiting_supplier",
    """WITH l AS (
      |  SELECT l_orderkey, l_suppkey,
      |         l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F')
      |SELECT s_name, count(*)::BIGINT AS numwait
      |FROM supplier JOIN l l1 ON s_suppkey = l1.l_suppkey
      |WHERE l1.late
      |  AND EXISTS (SELECT 1 FROM l l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM l l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin) {
    (s, d) =>
    import s.implicits._
    val l = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).filter($"o_orderstatus" === "F")
          .select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey",
        ($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
          .as("late"))
    val perOrder = l.groupBy($"l_orderkey".as("ok"))
      .agg(countDistinct($"l_suppkey").as("ns"),
        countDistinct(when($"late", $"l_suppkey")).as("nls"))
    l.filter($"late")
      .join(perOrder, $"ok" === $"l_orderkey")
      .where($"ns" >= 2 && $"nls" === 1)
      .join(broadcast(Tables.supplier(s, d)),
        $"s_suppkey" === $"l_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
  }

  /** TPC-H Q2 shape (minimum-cost supplier): the argmin-correlated
    * subquery — for each qualifying part, the EUROPE suppliers whose
    * observed unit cost equals the per-part minimum. This schema has
    * no `partsupp`, so supply cost is DERIVED from the fact table:
    * per (part, supplier), the minimum observed unit price over all
    * their lines, kept exact-integer as
    * `(price_cents * 10) div quantity` (tenth-cents, floor division —
    * identical semantics to DuckDB `//` on positive BIGINTs, no float
    * boundary for the min/equality compares to sit on).
    *
    * Scale shape: ONE partial-aggregated pass over lineitem builds the
    * (part, supplier) cost table — the only fact-sized shuffle; the
    * region-restricted supplier dim and the size/type-filtered part
    * dim both broadcast. The per-part argmin is a WINDOW MIN over pk,
    * not a join back against a grouped-min subquery: the join form
    * plans the filtered cost pipeline TWICE (one per join side — the
    * min aggregate on top defeats exchange reuse), doubling the fact
    * pass at scale; the window form re-exchanges the already-filtered
    * (tiny) cost rows once and needs no self-join at all. */
  val q2MinCostSupplier: CatalogEntry = CatalogEntry(
    "q2_min_cost_supplier",
    """WITH cost AS (
      |  SELECT l_partkey AS pk, l_suppkey AS sk,
      |    min((round(l_extendedprice*100)::BIGINT * 10)
      |        // l_quantity::BIGINT)::BIGINT AS cost_e3
      |  FROM lineitem GROUP BY 1, 2),
      |eu AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'),
      |pc AS (
      |  SELECT pk, sk, cost_e3,
      |    min(cost_e3) OVER (PARTITION BY pk) AS mc
      |  FROM cost
      |  JOIN eu ON sk = s_suppkey
      |  JOIN part ON p_partkey = pk
      |  WHERE p_size = 15 AND p_type = 'STANDARD')
      |SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
      |       p_partkey, p_name, cost_e3
      |FROM pc
      |JOIN eu ON sk = s_suppkey
      |JOIN part ON p_partkey = pc.pk
      |WHERE cost_e3 = mc
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin) { (s, d) =>
    import s.implicits._
    val cost = Tables.lineitem(s, d)
      .groupBy($"l_partkey".as("pk"), $"l_suppkey".as("sk"))
      .agg(min(expr("(CAST(round(l_extendedprice*100) AS BIGINT) * 10) " +
        "div CAST(l_quantity AS BIGINT)")).as("cost_e3"))
    val eu = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)
              .filter($"r_name" === "EUROPE")),
            $"n_regionkey" === $"r_regionkey")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    val qualPart = Tables.part(s, d)
      .filter($"p_size" === 15 && $"p_type" === "STANDARD")
      .select($"p_partkey", $"p_name")
    val pc = cost
      .join(broadcast(eu.select($"s_suppkey")), $"sk" === $"s_suppkey")
      .join(broadcast(qualPart.select($"p_partkey")), $"pk" === $"p_partkey")
      .select($"pk", $"sk", $"cost_e3")
      .withColumn("mc",
        min($"cost_e3").over(Window.partitionBy($"pk")))
    pc.where($"cost_e3" === $"mc")
      .join(broadcast(eu), $"sk" === $"s_suppkey")
      .join(broadcast(qualPart), $"pk" === $"p_partkey")
      .select(round($"s_acctbal", 2).as("s_acctbal"), $"s_name", $"n_name",
        $"p_partkey", $"p_name", $"cost_e3")
      .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
      .limit(100)
  }

  /** TPC-H Q20 shape (excess-share suppliers): suppliers in a region
    * whose 1996 shipments of a part family exceed HALF their all-time
    * shipments of that part — the `ps_availqty > 0.5 * sum(qty)`
    * correlated-aggregate semi-join, adapted to a schema without
    * `partsupp` (1996 share stands in for available stock). The half
    * threshold is exact-integer: `2*q96 > qall` (quantities are
    * integral), so no 0.5 float multiply. Scale shape: the part-family
    * filter broadcasts into the fact scan; ONE partial-aggregated
    * pass builds per-(supplier, part) conditional sums (the CASE sum
    * combines map-side, so the shuffle carries two BIGINTs per pair);
    * the qualifying supplier set is DISTINCT-collapsed and broadcast
    * into a LEFT SEMI probe of the supplier dim — the fact table is
    * never joined row-wise to supplier. */
  val q20ExcessShare: CatalogEntry = CatalogEntry(
    "q20_excess_share",
    """WITH pq AS (
      |  SELECT l_suppkey AS sk,
      |    sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
      |             AND l_shipdate < TIMESTAMP '1997-01-01'
      |        THEN l_quantity::BIGINT ELSE 0 END)::BIGINT AS q96,
      |    sum(l_quantity::BIGINT)::BIGINT AS qall
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_name LIKE 'small%'
      |  GROUP BY sk, l_partkey)
      |SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE'
      |  AND s_suppkey IN (SELECT DISTINCT sk FROM pq WHERE 2*q96 > qall)
      |ORDER BY s_name, s_suppkey""".stripMargin) { (s, d) =>
    import s.implicits._
    val smallParts = Tables.part(s, d)
      .filter($"p_name".startsWith("small"))
      .select($"p_partkey")
    val pq = Tables.lineitem(s, d)
      .join(broadcast(smallParts), $"p_partkey" === $"l_partkey")
      .groupBy($"l_suppkey".as("sk"), $"l_partkey")
      .agg(sum(when($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp"),
          $"l_quantity".cast("bigint")).otherwise(0L)).as("q96"),
        sum($"l_quantity".cast("bigint")).as("qall"))
    val qualifying = pq.where(lit(2L) * $"q96" > $"qall")
      .select($"sk").distinct()
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)
              .filter($"r_name" === "EUROPE")),
            $"n_regionkey" === $"r_regionkey")),
        $"s_nationkey" === $"n_nationkey")
      .join(qualifying, $"s_suppkey" === $"sk", "left_semi")
      .select($"s_suppkey", $"s_name", round($"s_acctbal", 2).as("s_acctbal"))
      .orderBy($"s_name", $"s_suppkey")
  }

  /** BUCKETED CO-LOCATED JOIN — the shuffle-free fact⋈fact join the
    * scaladoc above promises: both sides written as bucketed tables
    * (8 buckets on the order key, sorted within buckets), then joined
    * — Spark matches the two bucket specs and plans the sort-merge
    * join with ZERO exchanges on either side ([[graft.
    * BucketedJoinSpec]] asserts it). This is THE 100 TB pattern for a
    * join repeated every pipeline run (fact tables bucketed once at
    * ingest, every downstream orderkey join shuffle-free forever); the
    * one-time bucketed write is the entry's honest build cost.
    *
    * Output is the per-priority revenue census with exact-integer
    * money: price and discount quantize INDEPENDENTLY to their native
    * 2-decimal lattices (cents / percent — never a halfway case, so
    * the per-row round is engine-stable), revenue = cents·(100−pct)
    * summed as order-free BIGINTs in 10⁻⁴-dollar units — this
    * aggregate spans the whole join, where q1-style double sums would
    * be partial-agg order-dependent. Oracle reads the raw parquet:
    * green means bucketing changed the PLAN, not the answer. */
  val joinBucketColocate: CatalogEntry = CatalogEntry(
    "join_bucket_colocate",
    """SELECT o_orderpriority,
      |  count(DISTINCT o_orderkey)::BIGINT AS n_orders,
      |  count(*)::BIGINT AS n_items,
      |  sum(round(l_extendedprice * 100, 0)::BIGINT
      |      * (100 - round(l_discount * 100, 0)::BIGINT))
      |    ::BIGINT AS revenue_c4
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    import s.implicits._
    val app = s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    // Dataset-derived token IN the table/path names: keyed on the app
    // id alone, two invocations in one session against different sf
    // dirs would share a name and path — the second write would serve
    // the FIRST caller's still-lazy read. The tables cannot be dropped
    // here (the returned DataFrame reads them lazily), so per-(app,
    // dataset) names are the isolation: reruns on the same dataset
    // overwrite their own table, never another dataset's.
    val ds = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(d))
    val base =
      s"${System.getProperty("java.io.tmpdir")}/graft_bucketed_${app}_$ds"
    val (tblO, tblL) = (s"graft_bko_${app}_$ds", s"graft_bkl_${app}_$ds")
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_orderpriority")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$base/orders").saveAsTable(tblO)
    Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$base/lineitem").saveAsTable(tblL)
    s.table(tblO)
      .join(s.table(tblL), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count_distinct($"o_orderkey").as("n_orders"),
        count(lit(1)).as("n_items"),
        sum(round($"l_extendedprice" * lit(100), 0).cast("long")
          * (lit(100L) - round($"l_discount" * lit(100), 0).cast("long")))
          .as("revenue_c4"))
      .orderBy($"o_orderpriority")
  }

  def entries: Seq[CatalogEntry] = Seq(
    joinBroadcastDim, joinLargeAgg, joinSemi, joinAnti,
    setUnion, setIntersect, setExcept,
    aggDistinctCount, aggApproxDistinct, aggRollup, dimLiteralJoin,
    joinFullOuter, sqlExistsSubquery, fuzzyJoinLevenshtein,
    fuzzyCorrectJaroWinkler, q22GlobalSales, q21WaitingSupplier,
    q2MinCostSupplier, q20ExcessShare, joinBucketColocate)
}
