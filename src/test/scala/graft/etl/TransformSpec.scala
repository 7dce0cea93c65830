package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

import graft.SparkTestBase

/** Coercion / derivation semantics of the transform chain
  * (transform.py:39-46, load_to_bigquery.py:38-54, fetch.py:39-44). */
class TransformSpec extends SparkTestBase {
  import spark.implicits._

  test("coerceDouble: invalid strings become null, never throw (errors='coerce')") {
    val out = Seq("1.5", "abc", "", "2e3", "NaN").toDF("s")
      .select(Transform.coerceDouble($"s").as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out(0).contains(1.5))
    assert(out(1).isEmpty)
    assert(out(2).isEmpty)
    assert(out(3).contains(2000.0))
    assert(out(4).exists(_.isNaN))
  }

  test("coerceTimestamp: invalid datetime becomes null") {
    val out = Seq("2024-01-02 03:04:05", "2024-13-99", "nope").toDF("s")
      .select(Transform.coerceTimestamp($"s").as("t"))
      .collect().map(r => Option(r.getTimestamp(0)))
    assert(out(0).contains(java.sql.Timestamp.valueOf("2024-01-02 03:04:05")))
    assert(out(1).isEmpty && out(2).isEmpty)
  }

  test("dropNullOn drops only rows null in the subset") {
    val df = Seq((Some(1.0), "a"), (None, "b"), (Some(2.0), null))
      .toDF("rate", "name")
    assert(Transform.dropNullOn(df, "rate").count() == 2)
    assert(Transform.dropNullOn(df).count() == 1) // all-column dropna
  }

  test("pair regex split: match and non-match (pandas str.extract → NaN)") {
    val out = Seq("USDEGP", "USDE", "usdegp", "XUSDEGP").toDF("pair")
      .select(Transform.pairBase($"pair").as("b"), Transform.pairTarget($"pair").as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out(0) == ("USD", "EGP"))
    assert(out(1) == (null, null))   // too short: no match → null, so a
    assert(out(2) == (null, null))   // dropna removes it (pandas parity)
    assert(out(3) == ("XUS", "DEG")) // unanchored first match, like pandas
  }

  test("targetFromPair: suffix slice semantics incl. short input (fetch.py:44)") {
    val out = Seq("USDEGP", "USDE", "USD").toDF("pair")
      .select(Transform.targetFromPair($"pair", 3).as("t"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("EGP", "E", ""))
  }

  test("pivotMapToRows: one row per map entry, other columns preserved") {
    val df = Seq((1, Map("USDEGP" -> 48.0, "USDEUR" -> 0.92)))
      .toDF("batch", "quotes")
    val out = Transform.pivotMapToRows(df, "quotes", "pair", "rate")
      .orderBy($"pair").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1, "USDEGP", 48.0), (1, "USDEUR", 0.92)))
  }

  test("alignSchema: projection order, coercing casts") {
    val df = Seq(("48.0", "USD", "x")).toDF("rate", "base", "junk")
    val out = Transform.alignSchema(df,
      Seq("base" -> StringType, "rate" -> DoubleType))
    assert(out.columns.toSeq == Seq("base", "rate"))
    assert(out.collect().head.getDouble(1) == 48.0)
  }

  test("requireNonEmpty raises on empty (fetch.py:55-56)") {
    val df = Seq("x").toDF("a")
    assert(Transform.requireNonEmpty(df, "ok").count() == 1)
    intercept[IllegalStateException] {
      Transform.requireNonEmpty(df.filter(lit(false)), "none")
    }
  }
}
