package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway env probe (deleted once checks pass). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    // runtime-set the legacy nanos conf (driver session won't have it)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$dir/events.parquet")
    println(s"== events rows: ${ev.count()}")
    ev.printSchema()
    ev.withColumn("ts2", timestamp_micros(col("ts") / 1000 cast "long")).show(3, false)
    spark.stop()
  }
}
