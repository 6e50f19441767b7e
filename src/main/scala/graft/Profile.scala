package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual SparkEntry queries (and optionally dump the
  * formatted plan) under the same config the driver benches with.
  *
  * Usage: runMain graft.Profile [-explain] <sfDir> <queryName>...
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val explain = args.contains("-explain")
    val rest = args.filterNot(_ == "-explain")
    val sfDir = rest.head
    val names = rest.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save() // scan/codegen warm-up
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (explain) { println(s"==== PLAN $name"); df.explain("formatted") }
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"TIME $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
