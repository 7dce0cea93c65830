package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SaltedJoinSpec extends SparkTestBase {
  import spark.implicits._

  // skewed probe: one hot key (0) with 2000 rows, 100 cold keys
  private val probe = (Seq.tabulate(2000)(i => (0L, i.toLong)) ++
    Seq.tabulate(100)(i => ((i % 10 + 1).toLong, (10000 + i).toLong)))
    .toDF("k", "pid")
  private val build = Seq.tabulate(8)(i => (i.toLong, s"dim$i"))
    .toDF("k", "label")

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select($"pid", coalesce($"label", lit("-")))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

  test("inner join equals the plain equi-join on skewed data") {
    val salted = SaltedJoin.saltedEquiJoin(probe, build, "k", "pid", salt = 8)
    val plain = probe.join(build, Seq("k"), "inner")
    assert(pairs(salted) == pairs(plain))
  }

  test("left join preserves unmatched and null-key probe rows") {
    val p = probe.union(Seq((null.asInstanceOf[java.lang.Long],
      java.lang.Long.valueOf(99999L))).toDF("k", "pid"))
    val salted = SaltedJoin.saltedEquiJoin(p, build, "k", "pid",
      salt = 4, joinType = "left")
    val plain = p.join(build, Seq("k"), "left")
    assert(pairs(salted) == pairs(plain))
    assert(pairs(salted).exists(_._1 == 99999L), "null-key row must survive")
  }

  test("the hot key spreads across more than one shuffle partition") {
    // force the shuffle path (a broadcast build would keep the probe's
    // incoming partitioning) and keep AQE from re-coalescing the tiny
    // test shuffle into one partition — at scale the hot partitions
    // would be far above the coalesce target anyway
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val salted = SaltedJoin.saltedEquiJoin(probe, build, "k", "pid", salt = 8)
      val parts = salted.filter($"k" === 0)
        .select(spark_partition_id()).distinct().count()
      assert(parts > 1, s"hot key must occupy >1 partition, got $parts")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    }
  }

  test("sf0.1 scale: a manufactured 50%-hot key spreads over at least " +
      "salt/2 shuffle partitions (histogram printed)") {
    // the operator's whole point, asserted at real scale: ~300k of
    // lineitem-sf0.1's ~600k rows collapse onto key 0, and the salted
    // join must spread them across the shuffle instead of one partition
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val sf = "/root/testdata/sf0.1"
      val li = graft.Tables.lineitem(spark, sf)
      val probe = li.select(
        when(pmod($"l_orderkey", lit(2)) === 0, 0L)
          .otherwise($"l_orderkey").as("k"),
        ($"l_orderkey" * 10 + $"l_linenumber").as("pid"))
      val build = probe.select($"k").distinct()
        .withColumn("label", concat(lit("d"), $"k"))
      val salt = 8
      val salted = SaltedJoin.saltedEquiJoin(probe, build, "k", "pid", salt)
      val hist = salted.filter($"k" === 0)
        .groupBy(spark_partition_id().as("part")).count()
        .orderBy($"part")
        .collect().map(r => r.getInt(0) -> r.getLong(1))
      info("hot-key rows per shuffle partition: " +
        hist.map { case (p, n) => s"$p:$n" }.mkString(" "))
      assert(hist.length >= salt / 2,
        s"hot key occupies ${hist.length} partitions, need >= ${salt / 2}")
      // and the plain join concentrates the same rows on exactly ONE
      // partition — the contrast that justifies the operator
      val plainParts = probe.join(build.withColumnRenamed("k", "bk")
          .hint("shuffle_hash"), $"k" === $"bk")
        .filter($"k" === 0)
        .select(spark_partition_id()).distinct().count()
      assert(plainParts == 1L,
        s"plain shuffled join should melt one partition, got $plainParts")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    }
  }

  test("arguments are validated") {
    intercept[IllegalArgumentException] {
      SaltedJoin.saltedEquiJoin(probe, build, "k", "pid", salt = 1)
    }
    intercept[IllegalArgumentException] {
      SaltedJoin.saltedEquiJoin(probe, build.withColumnRenamed("label", "pid"),
        "k", "pid", salt = 4)
    }
  }
}
