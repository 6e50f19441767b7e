package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN/IVF scaling probe at 1× / 10× / 100× (round-14: the second
  * high-traffic family probed across two decades, after
  * [[NearDupScaleProbe]]). Pins the IVF cost model against measurement:
  *
  *  - SERVE: with nCells ≈ √n (the standard FAISS sizing) and a fixed
  *    nProbe, the scanned candidate set is n·nProbe/nCells ∝ √n — the
  *    serve path is SUB-LINEAR in corpus size by design (partition
  *    pruning makes "scan 4 of C cell directories" a plan property,
  *    not a runtime filter).
  *  - BUILD: flat assignment is n·C distance evals — with C = √n that
  *    is O(n^1.5), the quietly-superlinear step 10× probes miss. The
  *    two-level assignment ([[graft.text.Similarity.ivfAssignTwoLevel]])
  *    cuts it to n·(G + C/G) ≈ n·2√C; both are measured head-to-head
  *    at the 100× point.
  *  - RECALL@10 vs exact brute force at every scale, for BOTH
  *    assignment modes at 100× — the hierarchy's boundary
  *    approximation must not move recall.
  *
  * Corpus is GENERATED (never fixture bytes): 64-dim vectors in 64
  * planted clusters — component j of vector i is ±1 pseudo-noise
  * (xxhash64(i,j), deterministic) plus +4.0 on the cluster axis
  * (i mod 64). True neighbors are in-cluster; centroids sampled from
  * the corpus land in clusters, so cells subdivide clusters and
  * nProbe=4 probes the query's cluster neighborhood.
  *
  * Run: {{{ sbt "runMain graft.tools.AnnScaleProbe" }}}
  */
object AnnScaleProbe {

  def corpus(spark: SparkSession, n: Long): DataFrame = {
    val cols = (0 until 64).map { j =>
      val noise = (pmod(xxhash64(col("id"), lit(j)), lit(2001L)) - 1000L)
        .cast("double") / 1000.0
      val axis = when(pmod(col("id"), lit(64L)) === j, 4.0).otherwise(0.0)
      (noise + axis).cast("float")
    }
    spark.range(n).select(col("id").as("vec_id"),
      array(cols: _*).as("embedding"))
  }

  private def recallAt10(spark: SparkSession, idx: String, docs: DataFrame,
      queries: DataFrame): (Double, Double, Long) = {
    import graft.text.Similarity
    val t0 = System.nanoTime()
    val approx = Similarity.topKIvfStore(spark, idx, queries,
      "vec_id", "embedding", k = 10, nProbe = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val serveWall = (System.nanoTime() - t0) / 1e9
    val exact = Similarity.topKBruteForce(docs, queries,
      "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    val cands = Similarity.ivfStoreCandidates(spark, idx, queries,
      "vec_id", "embedding", nProbe = 8).count()
    (recall, serveWall, cands)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.Similarity
    val root = java.nio.file.Files.createTempDirectory("ann_scale").toString
    // JIT warm-up, uncounted
    Similarity.writeIvfStore(corpus(spark, 2000L), "vec_id", "embedding",
      s"$root/warm", nCentroids = 14)

    // (n, nCells ≈ √n, two-level groups for the 100× contrast)
    val plan = Seq((20000L, 45, 0), (200000L, 141, 0),
      (2000000L, 448, 0), (2000000L, 448, 45))
    val rows = plan.zipWithIndex.map { case ((n, c, g), i) =>
      val docs = corpus(spark, n).localCheckpoint() // generate once
      val idx = s"$root/idx$i"
      val t0 = System.nanoTime()
      Similarity.writeIvfStore(docs, "vec_id", "embedding", idx,
        nCentroids = c, assignGroups = g, groupProbes = 4)
      val buildWall = (System.nanoTime() - t0) / 1e9
      val queries = docs.where(pmod(col("vec_id"), lit(n / 50)) === 0)
        .localCheckpoint()
      val (recall, serveWall, cands) =
        recallAt10(spark, idx, docs, queries)
      println(f"[ann-scale] n=$n%-8d C=$c%-4d mode=${if (g > 0) s"2level/G=$g"
        else "flat"}%-11s build=$buildWall%7.2fs serve=$serveWall%6.2fs " +
        f"cands=$cands%-7d recall@10=$recall%.3f")
      // drop this scale's cached blocks before the next one — leaked
      // checkpoints inflate later rows' GC by tens of seconds
      docs.unpersist(blocking = true)
      queries.unpersist(blocking = true)
      (n, c, g, buildWall, serveWall, cands, recall)
    }
    val (n1, _, _, b1, s1, c1, _) = rows(0)
    val (n3, _, _, b3, s3, c3, _) = rows(2)
    def exp(a: Double, b: Double) = math.log(b / a) / math.log(n3.toDouble / n1)
    println(f"[ann-scale] fitted exponents over 2 decades (flat): " +
      f"serve-candidates ${exp(c1.toDouble, c3.toDouble)}%.3f (model 0.5), " +
      f"serve-wall ${exp(s1, s3)}%.3f, build-wall ${exp(b1, b3)}%.3f " +
      f"(model 1.5 flat)")
    val (_, _, _, b4, _, _, r4) = rows(3)
    println(f"[ann-scale] 100× build flat ${b3}%.1fs vs two-level " +
      f"${b4}%.1fs (${b3 / b4}%.1f× cut), recall flat ${rows(2)._7}%.3f " +
      f"vs two-level $r4%.3f")
    spark.stop()
  }
}
