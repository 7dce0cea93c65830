package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe equi-join: deterministically salt the large (skewed) probe
  * side into `salt` sub-keys and replicate every build row once per
  * salt value, then equi-join on (key, salt) — one hot key's rows
  * spread over `salt` shuffle partitions instead of melting a single
  * task.
  *
  * This is the static counterpart of AQE's runtime skew split: AQE
  * needs accurate runtime stats and only splits sort-merge partitions;
  * the salted formulation is deterministic, works when stats are
  * missing or the skew is in a single key (AQE cannot split one key's
  * sorted run across tasks for a hash join build), and composes with
  * any join that follows. Cost: the build side shuffles `salt`× — use
  * it when |build| ≪ |probe| and the probe key histogram is spiked
  * (the exact situation where the plain join stalls).
  *
  * Semantics are IDENTICAL to the plain equi-join (inner or left-
  * outer): every probe row carries exactly one salt value, and the
  * build replica set contains every build row under every salt value,
  * so each matching (probe, build) pair meets exactly once. Null probe
  * keys behave as in the plain join (never match; preserved under
  * left). Proven by the SaltedJoinSpec equivalence tests and the
  * oracled `join_salted_skew` catalog entry.
  *
  * The build side is pinned to a SHUFFLE strategy (`shuffle_hash`
  * hint): salting only makes sense when the build cannot broadcast —
  * if it can, don't salt, just broadcast — yet at test scale Catalyst/
  * AQE would happily broadcast the salt-times-replicated build, paying
  * a serial driver-built hash table `salt`x bigger than the problem
  * while the hot key never spreads at all. Pinning keeps the operator
  * on the plan it exists to produce at every scale (measured at sf0.1:
  * broadcast 2.00s vs pinned shuffled-hash 0.93s median-of-5, see
  * tools/SaltProfile). The hint only constrains strategy choice, never
  * semantics.
  */
object SaltedJoin {

  /** @param probeSaltCol probe column whose hash assigns the salt —
    *                     any well-distributed column (a unique id is
    *                     ideal; identical values co-salt, which only
    *                     narrows the spread, never breaks semantics)
    * @param joinType     "inner" or "left" */
  def saltedEquiJoin(probe: DataFrame, build: DataFrame, key: String,
      probeSaltCol: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt >= 2, s"salt must be >= 2, got $salt")
    require(Seq("inner", "left").contains(joinType),
      s"joinType must be inner or left, got $joinType")
    val overlap = probe.columns.toSet.intersect(build.columns.toSet) - key
    require(overlap.isEmpty, s"ambiguous columns: ${overlap.mkString(",")}")

    val p = probe.withColumn("__salt",
      pmod(xxhash64(col(probeSaltCol)), lit(salt)))
    val b = build
      .withColumn("__bsalt", explode(sequence(lit(0L), lit(salt - 1L))))
      .withColumnRenamed(key, "__bkey")
      .hint("shuffle_hash") // never broadcast a salt-replicated build
    p.join(b,
        p(key) === b("__bkey") && p("__salt") === b("__bsalt"), joinType)
      .drop("__salt", "__bsalt", "__bkey")
  }
}
