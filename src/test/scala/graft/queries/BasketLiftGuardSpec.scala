package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase, Tables}

/** The basket_cooccur_lift megabasket guard (bsz <= 1000 before pair
  * expansion) must be a pure SKEW guard on this data: TPC-H baskets
  * max out at 7 items, so the guarded entry's top-30 must be
  * bit-identical to an unguarded replica. */
class BasketLiftGuardSpec extends SparkTestBase {
  private val sfDir = "/root/testdata/sf0.001"

  test("guard leaves top-30 unchanged on data without megabaskets") {
    val s = spark
    import s.implicits._
    val guarded =
      SparkEntry.queries("basket_cooccur_lift")(spark, sfDir).collect()

    val baskets = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey".as("ord"), $"l_partkey".as("pk")).distinct()
    val nBaskets = baskets.agg(countDistinct($"ord").as("n"))
    val item = baskets.groupBy($"pk").agg(count(lit(1)).as("cnt"))
    val pairs = baskets.as("a")
      .join(baskets.as("b"), $"a.ord" === $"b.ord" && $"a.pk" < $"b.pk")
      .groupBy($"a.pk".as("pa"), $"b.pk".as("pb"))
      .agg(count(lit(1)).as("n_ab"))
      .where($"n_ab" >= 2)
    val unguarded = pairs
      .join(item.select($"pk".as("pa"), $"cnt".as("n_a")), "pa")
      .join(item.select($"pk".as("pb"), $"cnt".as("n_b")), "pb")
      .crossJoin(broadcast(nBaskets))
      .select($"pa", $"pb", $"n_ab", $"n_a", $"n_b",
        expr("(n_ab * n * 1000000) div (n_a * n_b)").as("lift_ppm"))
      .orderBy($"n_ab".desc, $"lift_ppm".desc, $"pa", $"pb")
      .limit(30)
      .collect()

    assert(guarded.toSeq == unguarded.toSeq)
  }

  test("guard actually drops pairs from a megabasket") {
    val s = spark
    import s.implicits._
    // one 3-item basket below the cap, one synthetic megabasket above
    // a tiny cap replica (cap 3 here to keep the fixture small — the
    // production cap is 1000; the mechanism is the same window+filter)
    val rows = (1 to 3).map(pk => (1L, pk.toLong)) ++
      (1 to 5).map(pk => (2L, pk.toLong))
    val baskets = rows.toDF("ord", "pk")
    val capped = baskets
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"ord")))
      .where($"bsz" <= 3)
      .select($"ord", $"pk")
    val pairCount = capped.as("a")
      .join(capped.as("b"), $"a.ord" === $"b.ord" && $"a.pk" < $"b.pk")
      .count()
    assert(pairCount == 3L) // C(3,2) from basket 1; basket 2 excluded
  }
}
