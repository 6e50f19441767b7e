package graft.ops

import graft.cube.{Cube, Dim}
import org.apache.spark.sql.functions._

/** Dimension / label manipulation (SURVEY.md §2.8). */
object Labels {

  /** `rename_labels` on the band dimension — source→target label map
    * compiled to a chained `when` (openeo_odc_driver.py:1089-1107). With no
    * `source` list, targets rename positionally via CubeMeta.bandOrder. */
  def renameBandLabels(c: Cube, target: Seq[String],
      source: Seq[String] = Nil): Cube = {
    val src = if (source.nonEmpty) source else c.meta.bandOrder
    if (src.length != target.length) throw graft.OpenEoError.LabelMismatch
    val mapping = src.zip(target)
    val expr = mapping.foldRight(col(Dim.Band)) { case ((s, t), acc) =>
      when(col(Dim.Band) === s, lit(t)).otherwise(acc)
    }
    Cube(c.df.withColumn(Dim.Band, expr),
      c.meta.copy(bandOrder = c.meta.bandOrder.map(b =>
        mapping.toMap.getOrElse(b, b))))
  }

  /** `rename_labels` on time with explicit new labels — join against the
    * (old → new) mapping of the ordered distinct time axis
    * (openeo_odc_driver.py:1109-1121). New labels become a string column
    * since arbitrary labels need not be timestamps. */
  def renameTimeLabels(c: Cube, target: Seq[String]): Cube = {
    val spark = c.df.sparkSession
    import spark.implicits._
    val times = c.df.select(Dim.Time).distinct()
      .as[java.sql.Timestamp].collect().sortBy(_.getTime)
    if (times.length != target.length) throw graft.OpenEoError.LabelMismatch
    val mapDf = broadcast(
      times.toSeq.zip(target).toDF(Dim.Time, "_new_time"))
    Cube(c.df.join(mapDf, Dim.Time).drop(Dim.Time)
      .withColumnRenamed("_new_time", Dim.Time), c.meta)
  }

  /** `add_dimension` — wrap a band-less cube as a single labeled band
    * (openeo_odc_driver.py:1123-1132). */
  def addDimension(c: Cube, label: String): Cube = {
    require(!c.has(Dim.Band), "cube already has a band dimension")
    Cube(c.df.withColumn(Dim.Band, lit(label)),
      c.meta.copy(bandOrder = Seq(label)))
  }

  /** `drop_dimension` for singleton dims (xarray squeeze analogue). */
  def dropDimension(c: Cube, dimension: String): Cube = {
    val d = Dim.canonical(dimension)
    Cube(c.df.drop(d),
      if (d == Dim.Band) c.meta.copy(bandOrder = Nil) else c.meta)
  }
}
