package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time a registered query N times at a scale dir and print
  * its final adaptive plan. `runMain graft.QueryProbe <name> [sfDir] [n]`.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($rows rows)")
    }
    val df = fn(spark, sfDir)
    df.collect() // finalize the adaptive plan on THIS QueryExecution
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
