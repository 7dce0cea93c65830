package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase

/** The MERGE-upsert semantic (load_to_bigquery.py:98-111), edge by edge:
  * the strict `S.timestamp > T.timestamp` guard (line 102), tie-keeps-
  * stored, insert-on-unseen, dup-keys-in-batch, and idempotence.
  */
class UpsertSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def rates(rows: (String, String, Double, String)*): DataFrame =
    rows.map { case (b, t, r, tstr) => (b, t, r, ts(tstr)) }
      .toDF("base", "target", "rate", "ts")
      .withColumn("uid", org.apache.spark.sql.functions
        .xxhash64($"base", $"target", $"rate", $"ts"))

  private val keys = Seq("base", "target")

  private def upsert(cur: DataFrame, inc: DataFrame): Map[(String, String), (Double, Timestamp)] =
    Load.upsertLatest(cur, inc, keys, "ts", "uid")
      .select($"base", $"target", $"rate", $"ts")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getTimestamp(3)))
      .toMap

  val current = rates(
    ("USD", "EGP", 48.0, "2024-01-02 00:00:00"),
    ("USD", "EUR", 0.92, "2024-01-02 00:00:00"))

  test("newer incoming row updates the stored row") {
    val inc = rates(("USD", "EGP", 49.0, "2024-01-03 00:00:00"))
    val out = upsert(current, inc)
    assert(out(("USD", "EGP")) == (49.0, ts("2024-01-03 00:00:00")))
    assert(out(("USD", "EUR")) == (0.92, ts("2024-01-02 00:00:00")))
  }

  test("older incoming row must NOT clobber a newer stored row") {
    val inc = rates(("USD", "EGP", 47.0, "2024-01-01 00:00:00"))
    assert(upsert(current, inc)(("USD", "EGP")) == (48.0, ts("2024-01-02 00:00:00")))
  }

  test("equal-timestamp incoming row keeps the stored row (strict >)") {
    val inc = rates(("USD", "EGP", 47.5, "2024-01-02 00:00:00"))
    assert(upsert(current, inc)(("USD", "EGP")) == (48.0, ts("2024-01-02 00:00:00")))
  }

  test("unseen key is inserted") {
    val inc = rates(("USD", "JPY", 148.0, "2024-01-01 00:00:00"))
    val out = upsert(current, inc)
    assert(out(("USD", "JPY")) == (148.0, ts("2024-01-01 00:00:00")))
    assert(out.size == 3)
  }

  test("duplicate keys in one batch: the batch's newest wins") {
    val inc = rates(
      ("USD", "EGP", 50.0, "2024-01-05 00:00:00"),
      ("USD", "EGP", 51.0, "2024-01-04 00:00:00"))
    assert(upsert(current, inc)(("USD", "EGP")) == (50.0, ts("2024-01-05 00:00:00")))
  }

  test("batch dup whose newest is still older than stored: stored wins") {
    val inc = rates(
      ("USD", "EGP", 40.0, "2024-01-01 00:00:00"),
      ("USD", "EGP", 41.0, "2024-01-01 12:00:00"))
    assert(upsert(current, inc)(("USD", "EGP")) == (48.0, ts("2024-01-02 00:00:00")))
  }

  test("idempotence: applying the same batch twice equals once") {
    val inc = rates(
      ("USD", "EGP", 49.0, "2024-01-03 00:00:00"),
      ("USD", "JPY", 148.0, "2024-01-01 00:00:00"))
    val once = Load.upsertLatest(current, inc, keys, "ts", "uid")
    val twice = Load.upsertLatest(once, inc, keys, "ts", "uid")
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("randomized: upsert equals latest-per-key over the union, with stored precedence on ties") {
    val rnd = new scala.util.Random(42)
    val targets = Seq("EGP", "EUR", "JPY", "GBP")
    def randRates(n: Int) = rates(Seq.fill(n)((
      "USD", targets(rnd.nextInt(targets.size)),
      math.rint(rnd.nextDouble() * 100) / 100 + 1.0,
      s"2024-01-${rnd.nextInt(28) + 1} 00:00:00")): _*)
    for (_ <- 1 to 5) {
      val cur = Load.latestPerKey(randRates(20), keys, "ts", "uid")
      val inc = randRates(20)
      val viaUpsert = upsert(cur, inc)
      // Reference model: per key take max ts over cur ∪ inc; if the max
      // ts appears in both sides, stored must win.
      val curRows = cur.select($"base", $"target", $"rate", $"ts").collect()
        .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(2), r.getTimestamp(3))))
      val incRows = inc.select($"base", $"target", $"rate", $"ts").collect()
        .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(2), r.getTimestamp(3))))
      val allKeys = (curRows ++ incRows).map(_._1).distinct
      allKeys.foreach { k =>
        val c = curRows.filter(_._1 == k).map(_._2)
        val i = incRows.filter(_._1 == k).map(_._2)
        val expectedTs = (c.map(_._2.getTime) ++ i.map(_._2.getTime)).max
        val got = viaUpsert(k)
        assert(got._2.getTime == expectedTs, s"key $k wrong ts")
        // ties toward stored; among tied incoming rows any is acceptable
        // to the semantic (impl breaks the tie deterministically on uid)
        if (c.nonEmpty && c.head._2.getTime == expectedTs)
          assert(got == c.head, s"key $k: tie must keep stored row")
        else {
          val tiedInc = i.filter(_._2.getTime == expectedTs).map(_._1).toSet
          assert(tiedInc.contains(got._1), s"key $k: expected an incoming winner")
        }
      }
    }
  }
}
