package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local SparkSession for all specs (one JVM-wide session — specs
  * run forked in a single test JVM). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = SparkSpec.spark
  import java.sql.Timestamp

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Tiny long-form cube: rows of (time, band, y, x, value). */
  def cubeOf(rows: (String, String, Double, Double, Double)*): graft.cube.Cube = {
    import spark.implicits._
    val df = rows.toSeq
      .map { case (t, b, y, x, v) => (ts(t + " 00:00:00"), b, y, x, v) }
      .toDF("time", "band", "y", "x", "value")
    graft.cube.Cube(df, graft.cube.CubeMeta(
      bandOrder = rows.map(_._2).distinct,
      grid = Some(graft.cube.GridRef(0, 0, 1, 1))))
  }

  def rowSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().toSet.map((r: Row) => r.toSeq)
}
