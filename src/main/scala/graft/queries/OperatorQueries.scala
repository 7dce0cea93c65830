package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, SaltedAgg}

/** Catalog entries for the custom whole-operator semantics
  * (operators/): as-of join and skew-salted aggregation.
  */
object OperatorQueries {

  private val fmt = "yyyy-MM-dd HH:mm:ss"
  private val dfmt = "%Y-%m-%d %H:%M:%S"

  /** As-of join: every event gets the same user's latest purchase at or
    * before it. The oracle is DuckDB's *native* ASOF LEFT JOIN — a
    * fully independent implementation of the semantics our union+window
    * formulation must reproduce. */
  val asofJoin: CatalogEntry = CatalogEntry(
    "asof_join",
    s"""WITH p AS (
       |  SELECT user_id, ts::TIMESTAMP AS pts, event_id AS pid, value AS pval
       |  FROM events WHERE event_type = 'purchase')
       |SELECT e.event_id, e.user_id,
       |  strftime(e.ts::TIMESTAMP, '$dfmt') AS ts_s,
       |  p.pid AS purchase_event_id,
       |  p.pval AS purchase_value
       |FROM events e ASOF LEFT JOIN p
       |  ON e.user_id = p.user_id AND e.ts::TIMESTAMP >= p.pts
       |ORDER BY e.event_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val ev = Tables.events(s, d)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id", $"value")
    AsOfJoin.leftAsOf(
      probe = ev.select($"event_id", $"user_id", $"ts"),
      build = purchases,
      probeKey = "user_id", buildKey = "user_id",
      probeTs = "ts", buildTs = "ts",
      payload = Seq("event_id", "value"), buildTie = "event_id")
      .select($"event_id", $"user_id",
        date_format($"ts", fmt).as("ts_s"),
        $"asof_event_id".as("purchase_event_id"),
        $"asof_value".as("purchase_value"))
      .orderBy($"event_id")
  }

  /** Salted two-phase aggregation over a genuinely skewed key (3 status
    * values ≈ |rows|/3 each). Oracle is the plain one-phase GROUP BY —
    * green proves the salting is semantics-preserving. */
  val aggSaltedSkew: CatalogEntry = CatalogEntry(
    "agg_salted_skew",
    """SELECT o_orderstatus,
      |  count(*)::BIGINT AS n,
      |  round(sum(o_totalprice), 2) AS sum_totalprice_r
      |FROM orders GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    import s.implicits._
    SaltedAgg.sumCount(Tables.orders(s, d), Seq("o_orderstatus"),
      "o_totalprice", uniqueCol = "o_orderkey", salt = 16)
      .select($"o_orderstatus", $"n",
        round($"sum_o_totalprice", 2).as("sum_totalprice_r"))
      .orderBy($"o_orderstatus")
  }

  def entries: Seq[CatalogEntry] = Seq(asofJoin, aggSaltedSkew)
}
