package graft

import graft.queries.JoinQueries

/** The co-located join contract: `join_bucket_colocate`'s sort-merge
  * join must consume the two bucketed scans DIRECTLY — zero shuffle
  * exchanges anywhere in the plan except the final aggregation and the
  * output sort. An un-bucketed orderkey join plans two more exchanges;
  * if a regression (bucketing disabled, bucket-spec mismatch, AQE
  * re-plan) re-introduces them, this suite fails before a driver round
  * ships the claim.
  */
class BucketedJoinSpec extends SparkTestBase {

  test("bucketed orderkey join plans zero exchanges below the join") {
    // At sf0.001 Catalyst rightly broadcasts the tiny orders side; the
    // co-location claim is about the 100 TB regime where neither side
    // fits a broadcast — force the non-broadcast path to expose it.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    val plan = try {
      spark.conf.set(key, "-1")
      JoinQueries.joinBucketColocate.query(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
    } finally spark.conf.set(key, saved)
    assert(plan.contains("SortMergeJoin"),
      s"expected a sort-merge join over the bucketed scans:\n$plan")
    // The aggregation and output sort keep their own exchanges (the
    // distinct-agg even expands to one on (priority, orderkey)) — what
    // bucketing must eliminate is any exchange keyed on the JOIN key
    // alone feeding the sort-merge join.
    assert(!plan.contains("hashpartitioning(o_orderkey") &&
      !plan.contains("hashpartitioning(l_orderkey"),
      s"join-key exchange present — bucketed co-location lost:\n$plan")
    assert(plan.contains("Bucketed: true"),
      s"scan did not report bucketed reading:\n$plan")
  }

  test("bucketed join result matches the raw-parquet formulation") {
    val d = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val bucketed = JoinQueries.joinBucketColocate.query(spark, d)
      .collect().map(_.toSeq).toSeq
    val raw = Tables.orders(spark, d)
      .join(Tables.lineitem(spark, d),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count_distinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_items"),
        sum(round(col("l_extendedprice") * lit(100), 0).cast("long")
          * (lit(100L) - round(col("l_discount") * lit(100), 0)
            .cast("long"))).as("revenue_c4"))
      .orderBy(col("o_orderpriority"))
      .collect().map(_.toSeq).toSeq
    assert(bucketed == raw)
  }
}
