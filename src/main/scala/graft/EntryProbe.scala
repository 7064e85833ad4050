package graft

import org.apache.spark.sql.SparkSession

/** Smoke probe for the driver's `entry` contract: prints the flagship
  * query's rows (expected: 4 sink rows whose `rows` sum to the sf0.001 turn
  * count of 6000).
  */
object EntryProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = SparkEntry.entry(spark).collect()
    rows.foreach(r => println(s"[entry] $r"))
    println(s"[entry] n_sinks=${rows.length} total_rows=${rows.map(_.getLong(1)).sum}")
    spark.stop()
  }
}
