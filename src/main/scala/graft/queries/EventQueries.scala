package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.Transform

/** Event-stream queries: the JSON/map surface (fetch.py:39-40's quotes
  * pivot, recast over `events.props`) and the tumbling-window aggregate
  * (SURVEY.md §2.9 extension over the micro-batch feed).
  *
  * Scale notes: `from_json`/`get_json_object` are codegen'd row-local
  * work fused into the scan; the tumbling window is a plain group-by on
  * (bucket, type) with map-side partial aggregation — the streaming
  * variant of the same plan just adds a watermark.
  */
object EventQueries {

  private val fmt = "yyyy-MM-dd HH:mm:ss"
  private val dfmt = "%Y-%m-%d %H:%M:%S"

  /** The fetch step's `{pair: rate}` map pivot (fetch.py:39-40): parse
    * the JSON object into a map column, explode to one row per entry. */
  val pivotMapToRows: CatalogEntry = CatalogEntry(
    "pivot_map_to_rows",
    """SELECT event_id, 'k' AS map_key, (props->>'$.k')::BIGINT AS map_value
      |FROM events
      |ORDER BY event_id, map_key""".stripMargin) { (s, d) =>
    import s.implicits._
    Transform.pivotMapToRows(
      Tables.events(s, d)
        .select($"event_id", from_json($"props",
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.LongType)).as("m")),
      "m", "map_key", "map_value")
      .orderBy($"event_id", $"map_key")
  }

  /** Scalar JSON path extraction + aggregate (events.props → $.k). */
  val jsonPropsExtract: CatalogEntry = CatalogEntry(
    "json_props_extract",
    """SELECT event_type,
      |  count(*)::BIGINT AS n,
      |  round(avg((props->>'$.k')::BIGINT), 4) AS avg_k,
      |  max((props->>'$.k')::BIGINT)::BIGINT AS max_k
      |FROM events GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.events(s, d)
      .withColumn("k", get_json_object($"props", "$.k").cast("bigint"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        round(avg($"k"), 4).as("avg_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  /** Tumbling 1 h window count+sum per event type (SURVEY.md §2.9):
    * `window()` buckets are epoch-aligned, exactly DuckDB's
    * time_bucket. */
  val eventsTumblingWindow: CatalogEntry = CatalogEntry(
    "events_tumbling_window",
    s"""SELECT strftime(time_bucket(INTERVAL '1 hour', ts::TIMESTAMP), '$dfmt') AS window_start,
       |  event_type,
       |  count(*)::BIGINT AS n,
       |  round(sum(value), 2) AS sum_value
       |FROM events GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.events(s, d)
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .select(date_format($"w.start", fmt).as("window_start"),
        $"event_type", $"n", $"sum_value")
      .orderBy($"window_start", $"event_type")
  }

  /** Batch sessionization: per user, a new session starts after a
    * >30 min gap; sessions aggregate to (count, start, end). The
    * lag→flag→cumulative-sum shape is the standard session-window
    * formulation; gap math in integer microseconds (exact in both
    * engines). Streaming-wise this is `session_window()` /
    * `flatMapGroupsWithState` — same plan per key. */
  val eventsSessionize: CatalogEntry = CatalogEntry(
    "events_sessionize",
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, ts::TIMESTAMP AS tsx,
       |    CASE WHEN lag(ts::TIMESTAMP) OVER w IS NULL
       |              OR epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts::TIMESTAMP) OVER w)
       |                 > 1800000000
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)),
       |sessions AS (
       |  SELECT *, sum(new_session) OVER (
       |    PARTITION BY user_id ORDER BY tsx, event_id
       |    ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
       |  FROM flagged)
       |SELECT user_id, session_id,
       |  count(*)::BIGINT AS n_events,
       |  strftime(min(tsx), '$dfmt') AS session_start,
       |  strftime(max(tsx), '$dfmt') AS session_end
       |FROM sessions GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val flagged = Tables.events(s, d)
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_session",
        when($"prev_ts".isNull ||
          unix_micros($"ts") - unix_micros($"prev_ts") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum($"new_session").over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    flagged.groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        date_format(min($"ts"), fmt).as("session_start"),
        date_format(max($"ts"), fmt).as("session_end"))
      .orderBy($"user_id", $"session_id")
  }

  def entries: Seq[CatalogEntry] = Seq(
    pivotMapToRows, jsonPropsExtract, eventsTumblingWindow, eventsSessionize)
}
