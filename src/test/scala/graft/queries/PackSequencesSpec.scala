package graft.queries

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Greedy sequence packing: the catalog entry's cross-engine oracle
  * replays the fold on the fixture corpus; THIS spec pins the fold's
  * semantic invariants on generated inputs the fixture can't produce
  * (oversized runs, singleton shards, all-equal sizes) against a plain
  * Scala reference fold.
  */
class PackSequencesSpec extends SparkTestBase {
  import spark.implicits._

  private val B = 60L

  /** Reference greedy fold — the semantics the HOF must reproduce. */
  private def referencePack(
      ns: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] = {
    var bin = 0L
    var used = 0L
    var first = true
    ns.sortBy(_._1).map { case (id, n) =>
      if (!first && used + n > B) { bin += 1; used = 0 }
      first = false
      val off = used
      used += n
      (id, n, bin, off)
    }
  }

  /** Run the same HOF formulation the catalog entry uses, over an
    * in-memory shard. */
  private def sparkPack(
      ns: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] = {
    val accType =
      "array<struct<doc_id:bigint,n:bigint,bin:bigint,bin_offset:bigint>>"
    ns.toDF("doc_id", "n").withColumn("shard", lit(0))
      .groupBy($"shard")
      .agg(sort_array(collect_list(struct($"doc_id", $"n"))).as("ds"))
      .select(explode(aggregate(
        $"ds",
        struct(array().cast(accType).as("acc"),
          lit(0L).as("bin"), lit(0L).as("used")),
        (st, e) => {
          val fits = st("used") === 0L || st("used") + e("n") <= B
          val bin = when(fits, st("bin")).otherwise(st("bin") + 1L)
          val off = when(fits, st("used")).otherwise(lit(0L))
          val used = when(fits, st("used") + e("n")).otherwise(e("n"))
          struct(
            concat(st("acc"), array(struct(e("doc_id").as("doc_id"),
              e("n").as("n"), bin.as("bin"), off.as("bin_offset"))))
              .as("acc"),
            bin.as("bin"), used.as("used"))
        },
        st => st("acc"))).as("p"))
      .select($"p.doc_id", $"p.n", $"p.bin", $"p.bin_offset")
      .as[(Long, Long, Long, Long)]
      .collect().toSeq.sortBy(_._1)
  }

  /** Reference FIRST-FIT-DECREASING fold — the semantics
    * `pack_sequences_ffd`'s HOF must reproduce: length-desc (ties on
    * id) placement into the FIRST open bin with room. */
  private def referenceFfd(
      ns: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] = {
    val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
    ns.sortBy { case (id, n) => (-n, id) }.map { case (id, n) =>
      val j = bins.indexWhere(_ + n <= B)
      if (j >= 0) { val off = bins(j); bins(j) += n; (id, n, j.toLong, off) }
      else { bins += n; (id, n, (bins.size - 1).toLong, 0L) }
    }.sortBy(_._1)
  }

  /** The same HOF formulation `pack_sequences_ffd` uses, over an
    * in-memory shard. */
  private def sparkPackFfd(
      ns: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] = {
    val accType =
      "array<struct<doc_id:bigint,n:bigint,bin:bigint,bin_offset:bigint>>"
    ns.toDF("doc_id", "n").withColumn("shard", lit(0))
      .groupBy($"shard")
      .agg(sort_array(collect_list(
        struct((-$"n").as("nn"), $"doc_id", $"n"))).as("ds"))
      .select(explode(aggregate(
        $"ds",
        struct(array().cast(accType).as("acc"),
          array().cast("array<bigint>").as("bins")),
        (st, e) => {
          val fitIdx = get(filter(transform(st("bins"),
            (b, i) => when(b + e("n") <= B, i + lit(1L))),
            x => x.isNotNull), lit(0))
          val fits = fitIdx.isNotNull
          val bin = when(fits, fitIdx - 1L)
            .otherwise(size(st("bins")).cast("long"))
          val off = when(fits,
            element_at(st("bins"), fitIdx.cast("int"))).otherwise(lit(0L))
          val bins = when(fits, transform(st("bins"),
            (b, i) => when(i.cast("long") + 1L === fitIdx, b + e("n"))
              .otherwise(b)))
            .otherwise(concat(st("bins"), array(e("n"))))
          struct(
            concat(st("acc"), array(struct(e("doc_id").as("doc_id"),
              e("n").as("n"), bin.as("bin"), off.as("bin_offset"))))
              .as("acc"),
            bins.as("bins"))
        },
        st => st("acc"))).as("p"))
      .select($"p.doc_id", $"p.n", $"p.bin", $"p.bin_offset")
      .as[(Long, Long, Long, Long)]
      .collect().toSeq.sortBy(_._1)
  }

  test("FFD fixed shapes: first-fit reopens earlier bins, oversized " +
      "docs own a bin, ties place by doc_id") {
    // 40+15 fill bin 0 via first-fit (next-fit would open a 3rd bin
    // after 35 lands in bin 1): sorted order 40, 35, 15
    assert(sparkPackFfd(Seq((1L, 40L), (2L, 35L), (3L, 15L))) ==
      Seq((1L, 40L, 0L, 0L), (2L, 35L, 1L, 0L), (3L, 15L, 0L, 40L)))
    // oversized doc sorts first, owns bin 0; nothing ever joins it
    assert(sparkPackFfd(Seq((1L, 10L), (2L, 100L))) ==
      Seq((1L, 10L, 1L, 0L), (2L, 100L, 0L, 0L)))
    // equal lengths tie-break by doc_id: placement order 1, 2, 3
    assert(sparkPackFfd(Seq((3L, 30L), (1L, 30L), (2L, 30L))) ==
      Seq((1L, 30L, 0L, 0L), (2L, 30L, 0L, 30L), (3L, 30L, 1L, 0L)))
  }

  test("forAll: FFD HOF equals the reference first-fit-decreasing " +
      "fold; bins respect the budget except oversized-doc bins") {
    val genDocs: Gen[List[(Long, Long)]] = for {
      m <- Gen.choose(1, 30)
      ids <- Gen.pick(m, 0L until 100L)
      ns <- Gen.listOfN(m, Gen.oneOf(Gen.choose(1L, 59L), Gen.choose(55L, 90L)))
    } yield ids.toList.zip(ns)
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(12)
      .withInitialSeed(Seed(246813579L))
    val res = SCTest.check(params, Prop.forAll(genDocs) { docs =>
      val got = sparkPackFfd(docs)
      val want = referenceFfd(docs)
      val binTotals = got.groupBy(_._3).view.mapValues(_.map(_._2).sum)
      val budgetOk = binTotals.forall { case (bin, tot) =>
        tot <= B || got.count(_._3 == bin) == 1
      }
      // within a bin, offsets reconstruct the PLACEMENT order
      // (length desc, then id) with no gaps
      val offsetsOk = got.groupBy(_._3).values.forall { rows =>
        rows.sortBy(r => (-r._2, r._1)).foldLeft((true, 0L)) {
          case ((ok, exp), r) => (ok && r._4 == exp, exp + r._2)
        }._1
      }
      got == want && budgetOk && offsetsOk
    })
    assert(res.passed, s"ffd pack law: ${res.status}")
  }

  test("fixture census: FFD dominates greedy on every source at " +
      "sf0.001 (the pack_efficiency_census done-condition)") {
    val rows = TextQueries.packEfficiencyCensus
      .query(spark, "/root/testdata/sf0.001")
      .select($"greedy_bins".cast("long"), $"ffd_bins".cast("long"))
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    // NOTE: lb_bins ≤ ffd_bins does NOT hold in general — an oversized
    // (>60-token) doc's own bin holds more than the budget, so sources
    // with overflow docs can use FEWER bins than ceil(Σtokens/60)
    // (the census surfaces this as >10⁶ fill rather than hiding it)
    rows.foreach { case (g, f) =>
      assert(f <= g, s"FFD used $f bins where greedy used $g")
    }
  }

  test("fixed shapes: oversized-first, oversized-mid, exact-fit boundary") {
    // first doc oversized: own bin 0; next doc starts bin 1
    assert(sparkPack(Seq((1L, 100L), (2L, 10L))) ==
      Seq((1L, 100L, 0L, 0L), (2L, 10L, 1L, 0L)))
    // exact fit stays in-bin (<=, not <)
    assert(sparkPack(Seq((1L, 50L), (2L, 10L), (3L, 1L))) ==
      Seq((1L, 50L, 0L, 0L), (2L, 10L, 0L, 50L), (3L, 1L, 1L, 0L)))
    // oversized in the middle evicts to its own bin, then packing resumes
    assert(sparkPack(Seq((1L, 30L), (2L, 200L), (3L, 30L), (4L, 30L))) ==
      Seq((1L, 30L, 0L, 0L), (2L, 200L, 1L, 0L),
        (3L, 30L, 2L, 0L), (4L, 30L, 2L, 30L)))
  }

  test("forAll: HOF fold equals the reference fold; bins respect the " +
      "budget except single-oversized-doc bins") {
    val genDocs: Gen[List[(Long, Long)]] = for {
      m <- Gen.choose(1, 30)
      ids <- Gen.pick(m, 0L until 100L)
      ns <- Gen.listOfN(m, Gen.oneOf(Gen.choose(1L, 59L), Gen.choose(55L, 90L)))
    } yield ids.toList.zip(ns)
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(12) // each case is a Spark job
      .withInitialSeed(Seed(135792468L))
    val res = SCTest.check(params, Prop.forAll(genDocs) { docs =>
      val got = sparkPack(docs)
      val want = referencePack(docs)
      val binTotals = got.groupBy(_._3).view.mapValues(_.map(_._2).sum)
      val budgetOk = binTotals.forall { case (bin, tot) =>
        tot <= B || got.count(_._3 == bin) == 1 // oversized doc alone
      }
      val offsetsOk = got.groupBy(_._3).values.forall { rows =>
        rows.sortBy(_._1).foldLeft((true, 0L)) { case ((ok, exp), r) =>
          (ok && r._4 == exp, exp + r._2)
        }._1
      }
      got == want && budgetOk && offsetsOk
    })
    assert(res.passed, s"pack law: ${res.status}")
  }
}
