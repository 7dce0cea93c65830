package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Semantic invariants of the round-17 estimator/census entries on the
  * sf0.001 fixture — properties the DuckDB hash gate implies only
  * indirectly (a hash match proves engine agreement, not that the
  * numbers obey the estimator's own mathematics).
  */
class R17EstimatorSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("dedup_bbit_minhash: a full 60-bit match implies a 2-bit match " +
      "(bbit_match >= full_match), estimators bounded, exact at 16/16") {
    val rows = SparkEntry.catalog("dedup_bbit_minhash").query(spark, sf)
      .select("full_match", "bbit_match", "r_full_ppm", "r_bbit_ppm")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (fm, bm) = (r.getLong(0), r.getLong(1))
      val (rf, rb) = (r.getLong(2), r.getLong(3))
      assert(bm >= fm, s"2-bit match count $bm < full match count $fm")
      assert(fm >= 0 && fm <= 16 && bm >= 0 && bm <= 16)
      assert(rf >= 0 && rf <= 1000000 && rb >= 0 && rb <= 1000000)
      if (fm == 16) assert(bm == 16 && rf == 1000000 && rb == 1000000)
      // the Li-Konig correction at the formula's own lattice points
      assert(rb == math.max(0L, (1000000L * (4 * bm - 16)) / 48))
    }
  }

  test("dedup_minhash_oph: densification leaves no doc without a full " +
      "8-band signature and bands are non-null") {
    val df = SparkEntry.catalog("dedup_minhash_oph").query(spark, sf)
    val perDoc = df.groupBy("doc_id").count().collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach(r => assert(r.getLong(1) == 8L,
      s"doc ${r.get(0)} has ${r.getLong(1)} bands, want 8"))
    assert(df.filter(df("band_sha").isNull).count() == 0L)
  }

  test("events_ohlc_candles: low <= open/close <= high per candle; " +
      "candle event counts conserve the raw event count") {
    val df = SparkEntry.catalog("events_ohlc_candles").query(spark, sf)
    val rows = df.select("open_cents", "high_cents", "low_cents",
      "close_cents", "n_events").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))
      assert(l <= o && o <= h, s"open $o outside [$l, $h]")
      assert(l <= c && c <= h, s"close $c outside [$l, $h]")
      assert(r.getLong(4) >= 1L)
    }
    val total = rows.map(_.getLong(4)).sum
    assert(total == graft.Tables.events(spark, sf).count())
  }

  test("stats_chisq_lang_source: the full grid conserves the corpus " +
      "(cell observed counts sum to the document count) and zero cells " +
      "carry their expected mass") {
    val df = SparkEntry.catalog("stats_chisq_lang_source").query(spark, sf)
    val rows = df.select("n_obs", "expected_milli", "chi2_contrib_micro")
      .collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(0)).sum == nDocs)
    // expected masses in milli must also reconstruct ~N (floor rounding
    // loses < 1 per cell)
    val expSum = rows.map(_.getLong(1)).sum
    assert(expSum > (nDocs - rows.length) * 1000 && expSum <= nDocs * 1000)
    rows.filter(_.getLong(0) == 0L).foreach { r =>
      assert(r.getLong(2) > 0L,
        "a zero cell with positive margins must contribute chi-squared mass")
    }
  }

  test("doc_lm_excess_rank: dense rank 1..50 in strictly " +
      "non-increasing excess order; averages are consistent with totals") {
    val rows = SparkEntry.catalog("doc_lm_excess_rank").query(spark, sf)
      .select("rnk", "u_nll_nano", "b_nll_nano", "excess_nano").collect()
    assert(rows.length == 50)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 50L))
    val ex = rows.map(_.getLong(3))
    assert(ex.zip(ex.tail).forall { case (a, b) => a >= b },
      "excess must be non-increasing down the ranking")
    rows.foreach(r =>
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1)))
  }

  test("embed_matryoshka_recall: one row per truncation width, hits in " +
      "[0, 10], recall_pct = 10 * n_hit") {
    val rows = SparkEntry.catalog("embed_matryoshka_recall").query(spark, sf)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(8L, 16L, 32L))
    rows.foreach { r =>
      val hit = r.getLong(1)
      assert(hit >= 0L && hit <= 10L)
      assert(r.getLong(2) == hit * 10)
    }
  }

  test("holt backtest origin guard: a 1-element series yields no origins " +
      "(unguarded, Spark's sequence silently DESCENDS into index 0)") {
    import org.apache.spark.sql.functions.{explode, expr}
    val df = Seq(Tuple1(Seq(1L))).toDF("xs")
    // the hazard: sequence(1, 0) is [1, 0], not empty
    val bad = df.select(expr(
      "sequence(greatest(1, size(xs) - 5), size(xs) - 1)"))
      .head.getSeq[Int](0)
    assert(bad == Seq(1, 0))
    // the entry's guard empties it out instead
    val n = df.select(explode(expr(
      """CASE WHEN size(xs) >= 2
        |  THEN sequence(greatest(1, size(xs) - 5), size(xs) - 1)
        |  ELSE cast(array() as array<int>) END""".stripMargin))).count()
    assert(n == 0L)
  }

  test("events_holt_forecast: forecasts extrapolate linearly from the " +
      "final state (f_{h+1} - f_h == trend) and every series is present") {
    val rows = SparkEntry.catalog("events_holt_forecast").query(spark, sf)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (l, b) = (r.getLong(2), r.getLong(3))
      assert(r.getLong(4) == l + b)
      assert(r.getLong(5) - r.getLong(4) == b)
      assert(r.getLong(6) - r.getLong(5) == b)
    }
  }
}
