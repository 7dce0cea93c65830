package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every catalog query on SPARK_GRAFT_SF_DIR.
  *
  * Measurement rules (round-1 + round-2 verdict fixes):
  *   - materialize the FULL plan through the `noop` sink — a bare
  *     `count()` lets Catalyst prune projections/sorts, timing a plan
  *     the correctness gate never checked;
  *   - one untimed warm-up pass first, so JVM/Spark/codegen startup
  *     isn't billed to whichever query happens to run first;
  *   - median of 3 timed runs per query — the r2 artifact recorded a
  *     single-shot 17s GC/JIT hiccup for a 1.4s query; a median absorbs
  *     one outlier, so two bench runs agree within noise;
  *   - emit the JSON line on stdout AND to bench_out.json, because the
  *     stdout line drowns in sbt log noise ("parsed": null in r01).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.keys.toSeq.sorted
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach(runOnce) // warm-up: fills code/metadata caches, untimed
    val results = names.map { n =>
      val t = Seq.fill(3)(runOnce(n))
      n -> (if (t.contains(-1.0)) -1.0 else t.sorted.apply(1)) // median of 3
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    Files.writeString(Paths.get("bench_out.json"), line)
    spark.stop()
  }
}
