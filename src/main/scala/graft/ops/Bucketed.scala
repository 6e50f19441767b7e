package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) storage for shuffle-free joins — the 100 TB
  * fact⋈fact answer. Two tables written with the SAME bucket count and
  * keys place every join key in the same bucket index on both sides;
  * a subsequent equi-join on those keys sort-merges bucket-by-bucket
  * with NO exchange on either side (plan-pinned: zero Exchange nodes
  * under the join), and with `sortBy` the per-bucket sort is already on
  * disk. The shuffle is paid ONCE at write time and amortized over
  * every subsequent join/aggregation on the key — exactly the
  * pre-partitioning trade a nightly 100 TB fact table wants.
  *
  * Bucketing metadata lives in the session catalog (`saveAsTable`), the
  * same mechanism [[graft.text.Similarity.writeIvfIndex]] uses for
  * probe-pruned ANN serving. */
object Bucketed {

  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      nBuckets: Int): Unit = {
    require(keys.nonEmpty, "writeBucketed needs bucket keys")
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val spark = df.sparkSession
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    // DROP a live catalog entry first — Spark itself deletes the data
    // directory of a MANAGED table on drop, using the table's REAL
    // location from the catalog (which a database-qualified name or a
    // custom LOCATION makes different from warehouse/<name>; an
    // EXTERNAL table's directory belongs to the user and is left alone).
    spark.sql(s"DROP TABLE IF EXISTS ${ident.quotedString}")
    // a previous SESSION's managed-table directory can survive while its
    // catalog entry does not — CREATE then fails LOCATION_ALREADY_EXISTS
    // even in overwrite mode. For that orphan case delete the path the
    // CATALOG would assign this identifier (defaultTablePath resolves
    // the current database and db-qualified names to their .db
    // directories), never a hand-reconstructed warehouse/<name> — which
    // under a non-default current database, or for `db.tbl`, points at a
    // DIFFERENT table's data.
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Equi-join two same-bucketed tables on their bucket keys — resolves
    * through the catalog so Spark sees the bucket specs and elides both
    * exchanges. */
  def bucketedJoin(spark: SparkSession, tableA: String, tableB: String,
      keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(tableA).join(spark.table(tableB), keys, joinType)
}
