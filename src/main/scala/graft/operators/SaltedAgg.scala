package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-phase aggregation: salt the hot key, partially
  * aggregate on (key, salt) — spreading one hot key over `salt`
  * reducers — then finish on the key alone. The second shuffle moves
  * |keys|×salt pre-aggregated rows, which is noise.
  *
  * This is the manual fallback for when AQE's skew handling can't help
  * (skewed *aggregation* rather than join, or a deliberately pinned
  * plan). Salt is derived deterministically from a unique column so
  * results — and the DuckDB oracle comparison — are reproducible.
  */
object SaltedAgg {

  /** sum+count per key, salted. Output: keyCols ++ (n, sum_<valCol>). */
  def sumCount(df: DataFrame, keyCols: Seq[String], valCol: String,
      uniqueCol: String, salt: Int): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    df.withColumn("__salt", pmod(xxhash64(col(uniqueCol)), lit(salt)))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valCol)).as("__s"))
      .groupBy(keys: _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as(s"sum_$valCol"))
  }
}
