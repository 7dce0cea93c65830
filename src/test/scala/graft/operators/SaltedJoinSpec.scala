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
