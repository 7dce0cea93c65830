package graft.queries

import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase

/** The round-18 statistical entries (classifier AUC, calibration bins,
  * Cohen's kappa, Theil-Sen / Mann-Kendall, Poisson bootstrap) checked
  * against BRUTE-FORCE plain-Scala references on the sf0.001 corpus —
  * an engine-independent second witness beside the DuckDB oracle: the
  * oracle proves Spark and DuckDB agree on the SQL; these prove the
  * SQL means what the statistic claims (tie-aware pair counting for
  * AUC, literal median-of-pairwise-slopes for Theil-Sen, literal
  * replica resampling for the bootstrap).
  */
class RobustStatsSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("quality_classifier_auc equals brute-force tie-aware pair " +
      "counting over (score, keep)") {
    val scores = TextQueries.qualityClassifierScore.query(spark, sf)
      .select($"doc_id", $"score_raw").as[(Long, Long)].collect().toMap
    val keeps = TextQueries.docQualityFilter.query(spark, sf)
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    val srcs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val expected = srcs.groupBy(_._2).map { case (src, docs) =>
      val xs = docs.keys.toSeq.filter(scores.contains)
        .map(id => (scores(id), keeps(id)))
      val pos = xs.filter(_._2).map(_._1)
      val neg = xs.filterNot(_._2).map(_._1)
      val auc =
        if (pos.isEmpty || neg.isEmpty) None
        else {
          // doubled pair score: 2 per strict win, 1 per tie
          val num2 = (for (p <- pos; n <- neg) yield {
            if (p > n) 2L else if (p == n) 1L else 0L
          }).sum
          Some(1000000L * num2 / (2L * pos.size * neg.size))
        }
      src -> ((xs.size.toLong, pos.size.toLong, auc))
    }
    val got = TextQueries.qualityClassifierAuc.query(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("quality_calibration_bins: bins partition the corpus, rates " +
      "match brute-force per-bin recount, tie groups never split") {
    val rows = TextQueries.qualityCalibrationBins.query(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val scores = TextQueries.qualityClassifierScore.query(spark, sf)
      .select($"doc_id", $"score_raw").as[(Long, Long)].collect().toMap
    val keeps = TextQueries.docQualityFilter.query(spark, sf)
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    val xs = scores.keys.toSeq.filter(keeps.contains)
      .map(id => (scores(id), keeps(id)))
    val n = xs.size.toLong
    assert(rows.map(_._2).sum == n, "bins must partition the corpus")
    // brute-force midpoint-rank binning per score group
    val byScore = xs.groupBy(_._1).toSeq.sortBy(_._1)
    var a0 = 0L
    val binOf = byScore.map { case (s, grp) =>
      val c = grp.size.toLong
      val bin = (2 * a0 + c - 1) * 5 / n
      a0 += c
      s -> bin
    }.toMap
    val expected = xs.groupBy(x => binOf(x._1)).toSeq.sortBy(_._1)
      .map { case (bin, grp) =>
        (bin, grp.size.toLong,
          grp.map(_._1).min, grp.map(_._1).max,
          grp.count(_._2).toLong,
          1000000L * grp.count(_._2) / grp.size)
      }
    assert(rows == expected, s"got $rows\nexpected $expected")
    // a score value appears in exactly one bin
    assert(rows.sliding(2).forall {
      case Seq(lo, hi) => lo._4 < hi._3
      case _ => true
    }, "tie groups must not straddle bins")
  }

  test("stats_cohen_kappa equals brute-force kappa over the " +
      "lang_id_heuristic predictions") {
    val pred = TextQueries.langIdHeuristic.query(spark, sf)
      .select($"lang", $"predicted_lang").as[(String, String)]
      .collect().toSeq
    val n = pred.size.toLong
    val diag = pred.count { case (a, b) => a == b }.toLong
    val rowM = pred.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val colM = pred.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val src = rowM.map { case (k, rn) => rn * colM.getOrElse(k, 0L) }.sum
    val expected = (n, diag, 1000000L * diag / n,
      BigInt(1000000) * src / (BigInt(n) * n),
      BigInt(1000000) * (BigInt(n) * diag - src) / (BigInt(n) * n - src))
    val r = TextQueries.statsCohenKappa.query(spark, sf).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2),
      BigInt(r.getLong(3)), BigInt(r.getLong(4)))
    assert(got == expected, s"got $got expected $expected")
  }

  test("events_theil_sen equals brute-force median-of-pairwise-slopes " +
      "and Mann-Kendall pair signs over the daily closes") {
    // daily closes replayed through the entry's own CTE semantics via
    // events_ohlc_candles' close column (same downsample rule)
    val closes = EventQueries.eventsOhlcCandles.query(spark, sf)
      .select($"event_type", $"day", $"close_cents")
      .as[(String, String, Long)].collect().toSeq
    val expected = closes.groupBy(_._1).map { case (t, rows) =>
      val s = rows.map(r =>
        (java.time.LocalDate.parse(r._2).toEpochDay, r._3)).sortBy(_._1)
      val pairs = for {
        i <- s.indices; j <- (i + 1) until s.size
      } yield (s(i), s(j))
      val slopes = pairs.map { case ((t1, x1), (t2, x2)) =>
        // Spark div / DuckDB // truncate toward zero; Scala / on Long
        // does too
        1000L * (x2 - x1) / (t2 - t1)
      }.sorted
      val m = slopes.size
      val mkS = pairs.map { case ((_, x1), (_, x2)) =>
        if (x2 > x1) 1L else if (x2 < x1) -1L else 0L
      }.sum
      val med2 = slopes((m + 1) / 2 - 1) + slopes(m / 2)
      t -> ((s.size.toLong, m.toLong, mkS, med2,
        if (mkS > 0) "up" else if (mkS < 0) "down" else "flat"))
    }
    val got = EventQueries.eventsTheilSen.query(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5)))).toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("events_bootstrap_ci equals brute-force replica resampling " +
      "through the same kernel draws") {
    val evs = graft.Tables.events(spark, sf)
      .select($"event_type", $"event_id",
        org.apache.spark.sql.functions.round($"value" * 100)
          .cast("long").as("x"))
      .as[(String, Long, Long)].collect().toSeq
    val expected = evs.groupBy(_._1).map { case (t, rows) =>
      val weighted = rows.map { case (_, id, x) =>
        val ws = graft.functions.SketchAlgos
          .bootPoisData(UTF8String.fromString(id.toString), 32)
        (x, (0 until 32).map(ws.getLong))
      }
      val ms = (0 until 32).flatMap { b =>
        val sw = weighted.map(_._2(b)).sum
        val swx = weighted.map { case (x, w) => w(b) * x }.sum
        if (sw > 0) Some(1000L * swx / sw) else None
      }
      val bn = ms.size.toLong
      val sm = ms.map(BigInt(_)).sum
      val sm2 = ms.map(m => BigInt(m) * m).sum
      t -> ((rows.size.toLong, 1000L * rows.map(_._3).sum / rows.size,
        bn, ms.min, ms.max, (bn * sm2 - sm * sm) / (bn * (bn - 1))))
    }
    val got = EventQueries.eventsBootstrapCi.query(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), BigInt(r.getLong(6))))).toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }
}
