package graft

/** openEO-spec error identities, mirroring the reference's error table
  * (openeo_odc_driver/openeo_error_messages.py:1-24). Operators throw
  * these typed errors; the API layer maps them to the spec's
  * `{"code": ..., "message": ...}` JSON with HTTP 400 instead of a bare
  * 500 with an exception string.
  */
final case class OpenEoError(code: String, msg: String)
    extends RuntimeException(s"$code - $msg")

object OpenEoError {
  val OverlapResolverMissing: OpenEoError = OpenEoError(
    "OverlapResolverMissing",
    "Overlapping data cubes, but no overlap resolver has been specified.")
  val TooManyDimensions: OpenEoError = OpenEoError("TooManyDimensions",
    "The number of temporal dimensions must be reduced to one for 'resample_cube_temporal'")
  val DimensionNotAvailable: OpenEoError = OpenEoError("DimensionNotAvailable",
    "A dimension with the specified name does not exist.")
  val MultiplicandMissing: OpenEoError = OpenEoError("MultiplicandMissing",
    "Multiplication requires at least two numbers.")
  val DivisionByZero: OpenEoError = OpenEoError("DivisionByZero",
    "Division by zero is not supported.")
  val DistinctDimensionLabelsRequired: OpenEoError = OpenEoError(
    "DistinctDimensionLabelsRequired",
    "The dimension labels have duplicate values. Distinct labels must be specified.")
  val LabelsNotEnumerated: OpenEoError = OpenEoError("LabelsNotEnumerated",
    "The dimension labels are not enumerated.")
  val LabelMismatch: OpenEoError = OpenEoError("LabelMismatch",
    "The number of labels in the parameters `source` and `target` don't match.")
  val LabelNotAvailable: OpenEoError = OpenEoError("LabelNotAvailable",
    "A label with the specified name does not exist.")
  val LabelExists: OpenEoError = OpenEoError("LabelExists",
    "A label with the specified name exists.")
  val QuantilesParameterMissing: OpenEoError = OpenEoError(
    "QuantilesParameterMissing",
    "The process `quantiles` requires either the `probabilities` or `q` parameter to be set.")
  val QuantilesParameterConflict: OpenEoError = OpenEoError(
    "QuantilesParameterConflict",
    "The process `quantiles` only allows that either the `probabilities` or the `q` parameter is set.")

  /** The reference raises a bare 'Not supported yet' for partially common
    * band sets (openeo_odc_driver.py:1195-1198); we give it a typed
    * identity instead of silently changing semantics. */
  val BandsPartiallyCommon: OpenEoError = OpenEoError("BandsPartiallyCommon",
    "merge_cubes between cubes with partially common band sets is not supported.")

  /** CRS outside the supported set (UTM zones incl. ETRS89 258xx and
    * NAD83 269xx, EPSG:4326/3035/3857/2154, the graft.ops.Proj registry,
    * and +proj-string definitions). */
  def crsNotSupported(epsg: Int): OpenEoError = OpenEoError("CrsNotSupported",
    s"EPSG:$epsg is not a supported coordinate reference system.")
}
