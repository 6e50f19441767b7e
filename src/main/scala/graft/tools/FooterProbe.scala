package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r14 optimization probe: can parquet FOOTER statistics replace the
  * distributed stats read-back inside a snapshot commit bit-for-bit?
  * Writes adversarial columns (NaN, -0.0, >2^53 longs, >64-char and
  * multibyte strings, all-null, timestamps, dates) through the normal
  * Spark parquet writer and prints footer min/max/rowcount next to the
  * Spark-aggregate min/max the current computeStats pass would record. */
object FooterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_footerprobe"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))

    val df = spark.range(6).select(
      col("id"),
      when(col("id") === 3, lit(Double.NaN))
        .otherwise(col("id").cast("double") - 2.5).as("d_nan"),
      when(col("id") === 0, lit(-0.0)).otherwise(lit(0.0)).as("d_zero"),
      (col("id") * lit(1234567890123456L)).as("big_l"),
      concat(lit("päö€-"), lpad(col("id").cast("string"), 80, "x"))
        .as("s_long"),
      lit(null).cast("string").as("s_null"),
      (col("id") === 2).cast("string").as("s_short"),
      timestamp_micros(col("id") * 1000000L + 1700000000000000L).as("ts"),
      date_add(to_date(lit("2020-01-01")), col("id").cast("int")).as("dt"),
      lit(Double.NaN).as("d_allnan"))
    df.coalesce(1).write.parquet(dir)

    // Spark-aggregate view (what computeStats records today)
    val agg = spark.read.parquet(dir).agg(
      count(lit(1)), min("d_nan"), max("d_nan"), min("d_zero"),
      max("d_zero"), min("big_l"), max("big_l"), min("s_long"),
      max("s_long"), min("s_null"), max("s_null"), min("s_short"),
      max("s_short"), min(unix_micros(col("ts"))),
      max(unix_micros(col("ts"))),
      min(datediff(col("dt"), to_date(lit("1970-01-01")))),
      max(datediff(col("dt"), to_date(lit("1970-01-01")))),
      min("d_allnan"), max("d_allnan")).collect()(0)
    println(s"SPARK AGG: $agg")

    // Footer view
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.hadoop.ParquetFileReader
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val rdr = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(f.toString), new Configuration()))
    try {
      val footer = rdr.getFooter
      import scala.jdk.CollectionConverters._
      println(s"rowcount=${footer.getBlocks.asScala.map(_.getRowCount).sum}")
      footer.getBlocks.asScala.foreach { b =>
        b.getColumns.asScala.foreach { c =>
          val st = c.getStatistics
          val ok = st != null && !st.isEmpty
          val mn = if (ok && st.hasNonNullValue) st.genericGetMin else null
          val mx = if (ok && st.hasNonNullValue) st.genericGetMax else null
          def render(v: Any): String = v match {
            case b: org.apache.parquet.io.api.Binary =>
              "B:" + new String(b.getBytes, java.nio.charset.StandardCharsets.UTF_8)
            case other => String.valueOf(other)
          }
          println(f"${c.getPath.toString}%-12s type=${c.getPrimitiveType}%-40s " +
            f"empty=${st == null || st.isEmpty} nulls=${if (ok) st.getNumNulls else -1} " +
            f"min=${render(mn)} max=${render(mx)}")
        }
      }
    } finally rdr.close()
    spark.stop()
  }
}
