package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`) — the
  * training-data-pipeline extension ops. Three tiers:
  *
  *  - brute-force cosine top-k: the exact baseline. Queries are broadcast
  *    (they're the small side); the corpus streams through one codegen'd
  *    scoring projection into a PARTIAL bounded top-k aggregate
  *    ([[graft.functions.TopKAgg]]) — each task reduces its slice to ≤ k
  *    rows per query before the only shuffle, so at 100 TB it is one scan
  *    plus a shuffle of nPartitions × nQueries × k tiny rows.
  *  - sign-LSH (random hyperplanes): banded bit-signature blocking like
  *    MinHash — candidates share a band bucket; exact cosine re-rank on
  *    candidates only. Corpus signatures are map-side literals (the
  *    hyperplanes are seeded constants), so the only added shuffle is the
  *    bucket join, whose left side is |corpus| × bands short rows.
  *  - IVF (inverted-file): coarse centroids (seeded deterministic sample
  *    or caller-provided), corpus assigned to its nearest centroid in ONE
  *    argmin projection over literal centroid vectors (zero shuffle, zero
  *    amplification); queries probe the nProbe nearest lists. The 100 TB
  *    path: assignment is written bucketed by centroid, so a query
  *    touches nProbe/nCentroids of the data.
  *
  * All dot products fold left-to-right in double precision via the
  * `aggregate` HOF, which matches DuckDB's `SUM(x ORDER BY i)` ordered
  * aggregate bit-for-bit — the oracle can verify cosine values exactly.
  */
object Similarity {

  /** Deterministic left-to-right double dot product. Numeric-array inputs
    * take the native codegen [[graft.functions.DotProduct]] expression;
    * anything else falls back to the (interpreted) HOF fold with identical
    * IEEE semantics. */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot(a, b)

  /** HOF formulation — kept as the semantic reference for [[dot]]. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Shared ranked-output tail: bounded top-k aggregate under
    * groupBy(query_id) — map-side combine reduces each task's slice to
    * <= k rows per query BEFORE the shuffle (see [[graft.functions.TopKAgg]]);
    * posexplode rebuilds the (rank, neighbor, cos) rows. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.TopKAgg.topK(k)(
        col("neighbor_id"), col("cos")).as("_top"))
      .select(col("query_id"), posexplode(col("_top")).as(Seq("_pos", "_s")))
      .select(col("query_id"), (col("_pos") + 1).cast("int").as("rank"),
        col("_s.id").as("neighbor_id"), round(col("_s.cos"), 9).as("cos"))

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors. Queries (small) are broadcast against the corpus. */
  def topKBruteForce(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, excludeSelf: Boolean = true): DataFrame = {
    // norms precomputed per side BEFORE the pair join: one HOF fold per
    // pair instead of three (IEEE-identical to cosine() — same ops, same
    // order, just not recomputed |corpus|×|queries| times)
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("_qv"), sqrt(norm2(col(vecCol))).as("_qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      sqrt(norm2(col(vecCol))).as("_cn"))
    val joined = c.join(q,
      if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
    val scored = joined.withColumn("cos",
      dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
    rankTopK(scored, k)
  }

  /** MARGIN-based candidate pair mining (Artetxe & Schwenk 2019 — the
    * LASER/CCMatrix bitext-mining scorer, and the general "is this pair
    * REALLY similar or is one side just a hub" criterion):
    *
    *   margin(x, y) = cos(x, y) /
    *     ( avgTopK_cos(x → tgt)/2 + avgTopK_cos(y → src)/2 )
    *
    * A raw cosine threshold over-selects hub vectors whose neighborhood
    * is uniformly close; dividing by the two local neighborhood
    * densities normalizes that away — margin > 1 means "closer than
    * each side's average nearest neighbors".
    *
    * Scored pairs = union of the forward (src→tgt) and backward
    * (tgt→src) top-k lists; both averages come from those same lists.
    * Determinism: cos is the rounded-9 fold both runs share; per-list
    * averages sum 1e-9-long-quantized contributions (order-free exact)
    * with ONE double division, and the margin is one further division —
    * bit-reproducible cross-engine.
    *
    * 100 TB shape: the two top-k runs are the pluggable part — here the
    * exact broadcast form ([[topKBruteForce]]: a SHARD of new sources
    * against the target corpus is the production mining batch); swap in
    * [[topKIvfStore]]/[[knnJoinIvf]] lists at corpus×corpus scale, the
    * margin algebra is identical. Everything after the lists is
    * Zipf-small: two per-query averages, a pair union, two broadcast
    * joins. */
  def marginMine(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int,
      threshold: Double = Double.NegativeInfinity): DataFrame = {
    // default −∞ = report EVERY pair from either list with its margin
    // (negative-cosine pairs included); thresholding is opt-in so the
    // caller, not a silent default, decides the mining cut
    require(k > 0, "marginMine needs k > 0")
    val fwd = topKBruteForce(tgt, src, idCol, vecCol, k)
    val bwd = topKBruteForce(src, tgt, idCol, vecCol, k)
    def qcos(c: Column): Column = round(c * lit(1e9), 0).cast("long")
    def avgOf(run: DataFrame, out: String): DataFrame = run
      .groupBy(col("query_id"))
      .agg((sum(qcos(col("cos"))).cast("double") /
        lit(2.0 * k * 1e9)).as(out))
    val aAvg = avgOf(fwd, "_ha") // half-average: avg/2, the margin form
    val bAvg = avgOf(bwd, "_hb")
    val pairs = fwd.select(col("query_id").as("src_id"),
        col("neighbor_id").as("tgt_id"), col("cos"))
      .unionByName(bwd.select(col("neighbor_id").as("src_id"),
        col("query_id").as("tgt_id"), col("cos")))
      .distinct()
    pairs
      .join(broadcast(aAvg.withColumnRenamed("query_id", "src_id")), "src_id")
      .join(broadcast(bAvg.withColumnRenamed("query_id", "tgt_id")), "tgt_id")
      .withColumn("margin", round(col("cos") / (col("_ha") + col("_hb")), 9))
      .where(col("margin") >= threshold)
      .select("src_id", "tgt_id", "cos", "margin")
  }

  /** Seeded deterministic Gaussian hyperplanes for sign-LSH. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign bit per hyperplane, packed into band keys of `bitsPerBand` bits.
    * Returns an array<struct<band:int, key:long>> for explode+join. */
  def lshBandKeys(vec: Column, planes: Array[Array[Double]],
      bitsPerBand: Int): Column = {
    val bits: Seq[Column] = planes.toSeq.map { p =>
      val planeLit = array(p.toSeq.map(lit): _*)
      when(dot(planeLit, vec) > 0, 1L).otherwise(0L)
    }
    val bands = bits.grouped(bitsPerBand).toSeq
    array(bands.zipWithIndex.map { case (bs, bi) =>
      val key = bs.zipWithIndex.map { case (b, i) => b * (1L << i) }
        .reduce(_ + _)
      struct(lit(bi).as("band"), key.as("key"))
    }: _*)
  }

  /** ANN top-k via sign-LSH banding: candidates = corpus vectors sharing at
    * least one band key with the query; exact cosine re-rank on candidates.
    * Output schema matches [[topKBruteForce]] (rank restarts at 1 within
    * the retrieved candidates). */
  def topKLsh(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nPlanes: Int = 16, bitsPerBand: Int = 4,
      seed: Long = 42L, excludeSelf: Boolean = true): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val planes = hyperplanes(nPlanes, dim, seed)
    def banded(df: DataFrame, id: String, v: String, n: String) = df
      .select(col(idCol).as(id), col(vecCol).as(v),
        sqrt(norm2(col(vecCol))).as(n),
        explode(lshBandKeys(col(vecCol), planes, bitsPerBand)).as("_b"))
      .select(col(id), col(v), col(n), col("_b.band"), col("_b.key"))
    val c = banded(corpus, "neighbor_id", "_cv", "_cn")
    val q = broadcast(banded(queries, "query_id", "_qv", "_qn"))
    val cands = c.join(q, Seq("band", "key"))
      .where(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select("query_id", "neighbor_id", "_qv", "_cv", "_qn", "_cn")
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cands.withColumn("cos",
      dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
    rankTopK(scored, k)
  }

  /** Deterministic coarse centroids: the embeddings of the `nCentroids`
    * corpus rows with the smallest xxhash64(id, seed) — a seeded uniform
    * sample without an RNG on data values. */
  def sampleCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, seed: Long = 42L): DataFrame = {
    // orderBy().limit() plans as TakeOrderedAndProject — a distributed
    // top-k, NOT a global sort; safe on a 100 TB corpus
    val sampled = corpus.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
      .limit(nCentroids)
    val w = Window.orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
    sampled.withColumn("centroid_id", row_number().over(w).cast("long") - 1)
      .select(col("centroid_id"), col(vecCol).as("_centroid"))
  }

  /** IVF assignment: nearest centroid per corpus vector. The centroid
    * table is tiny by construction, so it is collected once and unrolled
    * into ONE argmin projection over literal centroid vectors — zero
    * shuffle and zero row amplification (the previous formulation
    * crossJoined x nCentroids and re-shuffled the whole corpus through a
    * groupBy just to pick a per-row argmin). d2 uses the expansion
    * |v|^2 - 2 v.c + |c|^2 so each term is one native codegen dot product;
    * array_min over (d2, centroid_id) structs is the deterministic argmin
    * (lexicographic: min distance, ties to the lowest centroid id). */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val cents: Array[(Long, Array[Double])] = centroids.collect().map { r =>
      val cid = r.getLong(r.fieldIndex("centroid_id"))
      val vec = r.getSeq[Number](r.fieldIndex("_centroid"))
        .map(_.doubleValue()).toArray
      (cid, vec)
    }
    // The literal-unrolled argmin is ideal at gate-sized C (whole-stage
    // codegen, native dots) but Janino compilation of the C-struct
    // expression tree grows superlinearly — measured 122 s compile at
    // C=141 vs 0.9 s of actual row work (r14, BENCH_NOTES). Past the
    // cliff, route through the native row-level expression instead
    // (TwoLevelArgmin degenerates to an exact flat argmin with ONE
    // group and probes=1 — same strict-< lowest-id tie rule).
    val assignCol =
      if (cents.length <= 64)
        argminCentroid(col(vecCol), cents)
      else {
        val sorted = cents.sortBy(_._1)
        graft.functions.IvfExprs.assign2(col(vecCol),
          Array((0L, sorted.head._2)), Array(sorted), probes = 1)
      }
    corpus.select(col(idCol), col(vecCol), assignCol.as("centroid_id"))
  }

  /** Deterministic driver-side Lloyd's over the (tiny) CENTROID set:
    * groups the C coarse centroids into `nGroups` for the two-level
    * assignment path ([[ivfAssignTwoLevel]]). Pure Scala on ≤ a few
    * thousand points — never a Spark job. Init = evenly-spaced picks
    * over the cid-sorted centroids; assignment ties break to the lowest
    * gid; an emptied group keeps its previous center (the standard
    * Lloyd's fallback). Returns cid → gid. */
  def groupCentroids(cents: Array[(Long, Array[Double])], nGroups: Int,
      iters: Int = 10): Map[Long, Long] = {
    val sorted = cents.sortBy(_._1)
    val g = math.max(1, math.min(nGroups, sorted.length))
    val dim = sorted.head._2.length
    var centers: Array[Array[Double]] =
      Array.tabulate(g)(i => sorted(i * sorted.length / g)._2.clone())
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var assign = new Array[Int](sorted.length)
    var it = 0
    while (it < iters) {
      var c = 0
      while (c < sorted.length) {
        var best = 0; var bd = Double.PositiveInfinity
        var j = 0
        while (j < g) {
          val d = d2(sorted(c)._2, centers(j))
          if (d < bd) { bd = d; best = j }
          j += 1
        }
        assign(c) = best; c += 1
      }
      val sums = Array.fill(g)(new Array[Double](dim))
      val counts = new Array[Int](g)
      var c2 = 0
      while (c2 < sorted.length) {
        val j = assign(c2); counts(j) += 1
        var d = 0
        while (d < dim) { sums(j)(d) += sorted(c2)._2(d); d += 1 }
        c2 += 1
      }
      centers = Array.tabulate(g) { j =>
        if (counts(j) == 0) centers(j)
        else { val m = new Array[Double](dim)
          var d = 0
          while (d < dim) { m(d) = sums(j)(d) / counts(j); d += 1 }
          m }
      }
      it += 1
    }
    sorted.indices.map(i => sorted(i)._1 -> assign(i).toLong).toMap
  }

  /** Two-level IVF assignment (build-side scale path — see
    * [[graft.functions.IvfExprs.TwoLevelArgmin]]): group centers are the
    * means of each group's member centroids, recomputed from `mapping`
    * so any holder of (centroids, mapping) derives bit-identical
    * structure — that is what makes append ≡ rebuild hold for two-level
    * stores (the mapping is persisted next to the centroids). Output
    * schema is identical to [[ivfAssign]]. */
  def ivfAssignTwoLevel(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, mapping: Map[Long, Long],
      groupProbes: Int = 2): DataFrame = {
    val cents: Array[(Long, Array[Double])] = centroids.collect().map { r =>
      val cid = r.getLong(r.fieldIndex("centroid_id"))
      val vec = r.getSeq[Number](r.fieldIndex("_centroid"))
        .map(_.doubleValue()).toArray
      (cid, vec)
    }.sortBy(_._1)
    val dim = cents.head._2.length
    val byGid = cents.groupBy(c => mapping(c._1)).toArray.sortBy(_._1)
    val groups = byGid.map { case (gid, members) =>
      val m = new Array[Double](dim)
      members.foreach { case (_, v) =>
        var d = 0; while (d < dim) { m(d) += v(d); d += 1 } }
      var d = 0; while (d < dim) { m(d) /= members.length; d += 1 }
      (gid, m)
    }
    val children = byGid.map(_._2.sortBy(_._1))
    corpus.select(col(idCol), col(vecCol),
      graft.functions.IvfExprs.assign2(col(vecCol), groups, children,
        groupProbes).as("centroid_id"))
  }

  /** Literal-centroid argmin expression (shared by [[ivfAssign]] and the
    * k-means trainer): |v|² − 2 v·c + |c|² per centroid, array_min over
    * (d2, cid) structs — deterministic, ties to the lowest centroid id. */
  private def argminCentroid(v: Column,
      cents: Array[(Long, Array[Double])]): Column = {
    val vNorm2 = norm2(v)
    val entries = cents.map { case (cid, cvec) =>
      val cLit = array(cvec.map(lit).toSeq: _*)
      val cN2 = cvec.foldLeft(0.0)((acc, x) => acc + x * x) // driver-side
      struct((vNorm2 - lit(2.0) * dot(v, cLit) + lit(cN2)).as("d2"),
        lit(cid).as("cid"))
    }
    array_min(array(entries.toIndexedSeq: _*)).getField("cid")
  }

  /** Lloyd's k-means refinement of the IVF coarse centroids — the quality
    * step real IVF indexes train with (seeded-sample init, `iters` rounds).
    *
    * 100 TB shape per round: the assignment is the same map-side
    * literal-argmin projection as [[ivfAssign]] (zero shuffle, zero row
    * amplification); the update is ONE shuffle of per-partition
    * (centroid, dim) partial sums — posexplode amplifies rows ×dim but
    * hash aggregation collapses them to k×dim per task before the
    * exchange, and only k×dim (sum, count) rows reach the driver to form
    * the next round's literals. Empty clusters keep their previous
    * centroid (the standard Lloyd's fallback). Deterministic: seeded
    * init, argmin ties to lowest id, and per-component decimal(28,10)
    * sums so partial-aggregation order cannot flip a low bit of a mean. */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iters: Int = 5, seed: Long = 42L,
      initSample: Int = 4096): DataFrame = {
    val spark = corpus.sparkSession
    // Init = farthest-first traversal (Gonzalez) over a bounded
    // deterministic sample: hash-sampled seeds alone can land two seeds in
    // one cluster and leave another empty — and an empty cluster never
    // recovers under plain Lloyd's. Farthest-first guarantees one seed per
    // well-separated region, deterministically (no RNG, ties by scan
    // order). The sample is a TakeOrderedAndProject (distributed top-N by
    // hash), bounded driver memory; FAISS-style IVF training uses the
    // same sample-then-train shape.
    val sample: Array[Array[Double]] = corpus
      .select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
      .limit(math.max(initSample, nCentroids))
      .collect().map(_.getSeq[Number](1).map(_.doubleValue()).toArray)
    require(sample.length >= nCentroids,
      s"corpus has ${sample.length} rows < nCentroids=$nCentroids")
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val chosen = scala.collection.mutable.ArrayBuffer(sample(0))
    val minD = Array.fill(sample.length)(Double.MaxValue)
    while (chosen.length < nCentroids) {
      var best = -1; var bestD = -1.0
      var i = 0
      while (i < sample.length) {
        val d = math.min(minD(i), d2(sample(i), chosen.last))
        minD(i) = d
        if (d > bestD) { bestD = d; best = i }
        i += 1
      }
      chosen += sample(best)
    }
    var cents: Array[(Long, Array[Double])] =
      chosen.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toArray
    var round = 0
    while (round < iters) {
      val updated = corpus
        .select(argminCentroid(col(vecCol), cents).as("cid"),
          posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("v").cast("decimal(28,10)")).as("s"),
          count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getLong(0))
      cents = cents.map { case (cid, old) =>
        updated.get(cid) match {
          case Some(rows) =>
            val vec = old.clone()
            var n = 0L
            rows.foreach { r =>
              n = r.getLong(3)
              vec(r.getInt(1)) =
                (r.getDecimal(2).doubleValue() / n)
            }
            (cid, if (n == 0) old else vec)
          case None => (cid, old) // empty cluster keeps its centroid
        }
      }
      round += 1
    }
    import spark.implicits._
    cents.toSeq.map { case (cid, v) => (cid, v.toSeq) }
      .toDF("centroid_id", "_centroid")
  }

  /** Persist an IVF assignment bucketed (and sorted) by centroid — the
    * corpus-scale serving path: a probe query filters on its nProbe
    * centroid ids and the scan reads ONLY those buckets
    * (SelectedBucketsCount in the plan), i.e. nProbe/nCentroids of the
    * data, with no shuffle to re-cluster. */
  def writeIvfIndex(assigned: DataFrame, table: String,
      nBuckets: Int = 16): Unit =
    assigned.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, "centroid_id").sortBy("centroid_id")
      .saveAsTable(table)

  /** ANN top-k via IVF: each query probes its `nProbe` nearest centroid
    * lists, exact cosine within the probed lists. The assignment can be
    * persisted (bucketed by centroid_id) so repeated queries only scan
    * nProbe/nCentroids of the corpus. */
  def topKIvf(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCentroids: Int = 16, nProbe: Int = 4,
      seed: Long = 42L, excludeSelf: Boolean = true,
      centroidsOverride: Option[DataFrame] = None,
      trainIters: Int = 0): DataFrame = {
    val centroids = broadcast(centroidsOverride.getOrElse(
      if (trainIters > 0)
        kmeansCentroids(corpus, idCol, vecCol, nCentroids, trainIters, seed)
      else sampleCentroids(corpus, idCol, vecCol, nCentroids, seed)))
    val assigned = ivfAssign(corpus, centroids, idCol, vecCol)
      .withColumnRenamed(idCol, "neighbor_id")
      .withColumnRenamed(vecCol, "_cv")
    val probes = broadcast(probeCentroids(queries, centroids, idCol, vecCol,
        nProbe)
      .select(col("query_id"), col("_qv"), col("centroid_id")))
    val cands = assigned.join(probes, Seq("centroid_id"))
      .where(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
    val scored = cands.withColumn("cos",
      dot(col("_qv"), col("_cv")) /
        (sqrt(norm2(col("_qv"))) * sqrt(norm2(col("_cv")))))
    rankTopK(scored, k)
  }

  /** k-NN SELF-join: every corpus vector gets its k nearest neighbors,
    * IVF-blocked. This is NOT [[topKIvf]] with `queries = corpus`: there
    * the probe side is `broadcast()` (queries are assumed small), which
    * at corpus scale would ship the whole table to every executor. Here
    * BOTH sides are corpus-scale, so the candidate join is a plain
    * shuffled equi-join on `centroid_id` — each cell's members meet each
    * cell's probers inside one shuffle partition, and the bounded
    * [[graft.functions.TopKAgg]] partial aggregate collapses candidates
    * to ≤ k rows per query before the final exchange.
    *
    * Scale calibration: cells should number ~√N (so each holds ~√N rows
    * and per-cell candidate work stays ~N^1.5 / nCells ≈ N); with
    * 16 test centroids the math is identical, just denser. Skew is a
    * real failure mode when one cell captures a dense cluster, so the
    * hot-cell hatch is CODE, not a comment: `saltFactor = s` splits every
    * cell into s shards — members keep one deterministic shard
    * (xxhash64(id) mod s), probers fan out to all s — which divides the
    * largest cell's quadratic block by s at the cost of replicating only
    * the PROBE rows (id + vector), never the member lists. Results are
    * identical for any s ≥ 1: each (query, member) pair still meets
    * exactly once, in the member's shard.
    *
    * No reference counterpart (`/root/reference/openeo_odc_driver/` is
    * EO-only); this is the all-pairs companion of the ANN serving tier
    * (SemDeDup/D4 feed on exactly this join). */
  def knnJoinIvf(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nCentroids: Int = 16, nProbe: Int = 4, seed: Long = 42L,
      centroidsOverride: Option[DataFrame] = None,
      trainIters: Int = 0, saltFactor: Int = 1): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val centroids = broadcast(centroidsOverride.getOrElse(
      if (trainIters > 0)
        kmeansCentroids(corpus, idCol, vecCol, nCentroids, trainIters, seed)
      else sampleCentroids(corpus, idCol, vecCol, nCentroids, seed)))
    val assigned = ivfAssign(corpus, centroids, idCol, vecCol)
      .withColumnRenamed(idCol, "neighbor_id")
      .withColumnRenamed(vecCol, "_cv")
      .withColumn("_shard",
        pmod(xxhash64(col("neighbor_id")), lit(saltFactor.toLong)))
    // probe side: corpus-scale, deliberately NOT broadcast — fans out to
    // every shard of each probed cell. The shuffle_hash hint FORCES the
    // shuffled equi-join this blocking depends on: left to size
    // estimates, Spark happily broadcasts a probe side that LOOKS small
    // and pipelines the whole quadratic per-cell scoring into however
    // few partitions the corpus SCAN has (measured: 1 task, 4× slower
    // at the r8 sf1 smoke) — with the shuffle, parallelism is
    // (cells × shards) across shuffle partitions, independent of input
    // file layout.
    val probes = probeCentroids(corpus, centroids, idCol, vecCol, nProbe)
      .select(col("query_id"), col("_qv"), col("centroid_id"),
        explode(sequence(lit(0L), lit(saltFactor.toLong - 1))).as("_shard"))
    val cands = assigned.hint("shuffle_hash")
      .join(probes, Seq("centroid_id", "_shard"))
      .where(col("query_id") =!= col("neighbor_id"))
    val scored = cands.withColumn("cos",
      dot(col("_qv"), col("_cv")) /
        (sqrt(norm2(col("_qv"))) * sqrt(norm2(col("_cv")))))
    rankTopK(scored, k)
  }

  /** PERSISTED IVF store — the build-once-serve-many shape a 100 TB
    * vector corpus needs: [[writeIvfStore]] pays the full corpus pass
    * ONCE (centroid selection + assignment) and writes the assignment
    * PARTITIONED BY `centroid_id`, so a serving query
    * ([[topKIvfStore]]) reads ONLY its probed cells' directories —
    * partition pruning turns nProbe/nCentroids into a scan-bytes
    * fraction, not just a compute fraction. Centroids live beside the
    * assignment as a tiny parquet table.
    *
    * Serving is result-IDENTICAL to [[topKIvf]] with the same
    * parameters (same probe expressions, same scoring ops over the
    * losslessly round-tripped float vectors — oracle shared verbatim);
    * the only difference is WHERE the cells come from. */
  // ----------------------------------------------- generational stores

  /** GENERATIONAL store layout — the drift→retrain path for persisted
    * ANN stores. A store directory may hold numbered `gen-N/`
    * sub-stores; the CURRENT generation is the highest N carrying a
    * `_COMMITTED` marker (created by ONE atomic create-if-absent after
    * the generation's data is fully written — the snapshot log's claim
    * primitive in miniature). Every reader resolves the generation
    * ONCE per operation and reads only within it, which is the
    * serving-during-swap law: a query sees either the old or the new
    * index in full, never a mix (spec-pinned). A store without any
    * committed generation is the legacy FLAT layout (centroids/ +
    * assigned/ at the root) — fully supported, upgraded by the first
    * [[rebuildIvfStore]]/[[rebuildIvfPqStore]]. */
  private val GenRe = """gen-(\d+)""".r

  private def fsOf(spark: org.apache.spark.sql.SparkSession,
      path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def genDirs(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val fs = fsOf(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(root)) Nil
    else Option(fs.listStatus(root)).getOrElse(Array.empty).toSeq
      .collect { case st if st.isDirectory =>
        st.getPath.getName match {
          case GenRe(n) => Some((n.toLong, st.getPath))
          case _ => None
        }
      }.flatten
  }

  /** The directory serving reads RESOLVE TO: newest COMMITTED
    * generation, else the store root itself (legacy flat layout). */
  def currentStoreRoot(spark: org.apache.spark.sql.SparkSession,
      path: String): String = {
    val fs = fsOf(spark, path)
    genDirs(spark, path)
      .filter { case (_, p) =>
        fs.exists(new org.apache.hadoop.fs.Path(p, "_COMMITTED")) }
      .sortBy(-_._1).headOption
      // rebuild the string from the CALLER's path form (Path.toString
      // would add a scheme prefix the caller's string may lack)
      .map { case (n, _) => s"$path/gen-$n" }.getOrElse(path)
  }

  /** Publish `gen` atomically: the marker is create-if-absent, so two
    * racing rebuilds of the same generation number fail loudly rather
    * than tearing each other's data. */
  private def commitGen(spark: org.apache.spark.sql.SparkSession,
      gen: String): Unit =
    fsOf(spark, gen).create(
      new org.apache.hadoop.fs.Path(gen, "_COMMITTED"), false).close()

  private def nextGenPath(spark: org.apache.spark.sql.SparkSession,
      path: String): String = {
    val n = genDirs(spark, path).map(_._1).maxOption.getOrElse(0L) + 1
    s"$path/gen-$n"
  }

  /** Cell-occupancy DRIFT report over the current generation — the
    * retrain trigger: per coarse cell, its live row count and the
    * ratio to the mean cell. A healthy IVF store keeps ratios near 1;
    * a drifted corpus concentrates in few cells (probes then scan a
    * growing byte fraction) — when max_ratio crosses the caller's
    * threshold, [[rebuildIvfStore]]/[[rebuildIvfPqStore]] re-trains and
    * atomically swaps. Projection: the partition column only — the
    * report never reads vector bytes. */
  def ivfStoreSkewReport(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val root = currentStoreRoot(spark, path)
    val fs = fsOf(spark, root)
    val (dir, cellCol) =
      if (fs.exists(new org.apache.hadoop.fs.Path(root, "assigned")))
        (s"$root/assigned", "centroid_id")
      else (s"$root/encoded", "_cid")
    val counts = spark.read.parquet(dir)
      .groupBy(col(cellCol).cast("long").as("centroid_id"))
      .agg(count(lit(1)).as("n"))
    counts.select(col("centroid_id"), col("n"),
      (col("n") / (sum("n").over(
          org.apache.spark.sql.expressions.Window.partitionBy()) /
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy())))
        .as("ratio_to_mean"))
  }

  /** RETRAIN + ATOMIC SWAP for a raw-vector IVF store: re-trains
    * centroids from the store's own vectors (the store holds them —
    * no external corpus needed), writes a complete new `gen-N`
    * sub-store, and publishes it with one atomic marker create.
    * In-flight readers finish on the generation they resolved;
    * subsequent reads (and [[appendIvfStore]] shards) land on the new
    * one. Old generations (and the legacy flat layout) stay on disk
    * until [[vacuumIvfStore]] — the vacuum-grace idea without the
    * clock: retiring data a reader may still hold is an explicit
    * maintenance call, never a side effect of the swap. */
  def rebuildIvfStore(spark: org.apache.spark.sql.SparkSession,
      path: String, nCentroids: Int = 16, trainIters: Int = 2,
      seed: Long = 42L,
      centroidsOverride: Option[DataFrame] = None): String = {
    val root = currentStoreRoot(spark, path)
    val corpus = spark.read.parquet(s"$root/assigned")
      .select(col("neighbor_id").as("_rid"), col("_cv").as("_rvec"))
    val gen = nextGenPath(spark, path)
    writeIvfStore(corpus, "_rid", "_rvec", gen, nCentroids, trainIters,
      seed, centroidsOverride)
    commitGen(spark, gen)
    gen
  }

  /** RETRAIN + ATOMIC SWAP for a PQ store: codes are lossy, so the
    * caller supplies the source corpus (the embeddings table a
    * production pipeline retains anyway); centroids AND codebooks
    * re-train, the new generation encodes every vector fresh. */
  def rebuildIvfPqStore(spark: org.apache.spark.sql.SparkSession,
      path: String, corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int = 16, m: Int = 4, ksub: Int = 16,
      trainIters: Int = 2, seed: Long = 42L,
      centroidsOverride: Option[DataFrame] = None): String = {
    val gen = nextGenPath(spark, path)
    writeIvfPqStore(corpus, idCol, vecCol, gen, nCentroids, m, ksub,
      trainIters, seed, centroidsOverride)
    commitGen(spark, gen)
    gen
  }

  /** Retire everything below the current generation: older `gen-N`
    * directories, uncommitted (crashed) rebuild attempts, and the
    * legacy flat layout once a generation superseded it. Returns the
    * number of directories removed. Call from a maintenance window —
    * a reader still holding a retired generation loses it (the same
    * contract as snapshot vacuum). */
  def vacuumIvfStore(spark: org.apache.spark.sql.SparkSession,
      path: String): Int = {
    val fs = fsOf(spark, path)
    // compare by GENERATION NUMBER, never by path string (scheme
    // prefixes differ between the caller's form and listStatus's)
    val curGen = genDirs(spark, path)
      .filter { case (_, p) =>
        fs.exists(new org.apache.hadoop.fs.Path(p, "_COMMITTED")) }
      .map(_._1).maxOption
    if (curGen.isEmpty) return 0 // legacy flat, nothing newer exists
    var removed = 0
    genDirs(spark, path).foreach { case (n, p) =>
      if (n != curGen.get) { fs.delete(p, true); removed += 1 }
    }
    Seq("centroids", "assigned", "encoded", "codebook").foreach { d =>
      val p = new org.apache.hadoop.fs.Path(path, d)
      if (fs.exists(p)) { fs.delete(p, true); removed += 1 }
    }
    removed
  }

  def writeIvfStore(corpus: DataFrame, idCol: String, vecCol: String,
      path: String, nCentroids: Int = 16, trainIters: Int = 0,
      seed: Long = 42L,
      centroidsOverride: Option[DataFrame] = None,
      assignGroups: Int = 0, groupProbes: Int = 2): String = {
    val centroids = centroidsOverride.getOrElse(
      if (trainIters > 0)
        kmeansCentroids(corpus, idCol, vecCol, nCentroids, trainIters, seed)
      else sampleCentroids(corpus, idCol, vecCol, nCentroids, seed))
    centroids.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/centroids")
    // assignGroups > 0 → two-level assignment (O(n·2√C) build, see
    // ivfAssignTwoLevel). The cid→gid mapping is PERSISTED next to the
    // centroids so appends replay the exact same structure (append ≡
    // rebuild stays a law, not a hope).
    val assigned = if (assignGroups > 0) {
      val spark = corpus.sparkSession
      val cents = centroids.collect().map { r =>
        (r.getLong(r.fieldIndex("centroid_id")),
          r.getSeq[Number](r.fieldIndex("_centroid"))
            .map(_.doubleValue()).toArray)
      }
      val mapping = groupCentroids(cents, assignGroups)
      import spark.implicits._
      // probes rides in the file so appends replay the IDENTICAL
      // assignment function (mapping + probe width = the frozen
      // hierarchy; either differing would break append ≡ rebuild)
      mapping.toSeq.sorted.map { case (c, g) => (c, g, groupProbes) }
        .toDF("centroid_id", "gid", "probes")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/groups")
      ivfAssignTwoLevel(corpus, centroids, idCol, vecCol, mapping,
        groupProbes)
    } else ivfAssign(corpus, centroids, idCol, vecCol)
    assigned
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
        col("centroid_id"))
      .repartition(col("centroid_id")) // one writer set per cell dir
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$path/assigned")
    path
  }

  /** Incremental index MAINTENANCE — the production shape for a vector
    * corpus that grows daily: a shard of new vectors assigns against
    * the store's FROZEN centroids and APPENDS into the existing cell
    * directories (dynamic-partition append — only touched cells gain
    * files; the existing assignment is never read or rewritten).
    * Because assignment is a per-row argmin against frozen centroids,
    * any sequence of appends is row-identical to one [[writeIvfStore]]
    * over the concatenated corpus with the same centroids (law-tested
    * in SimilaritySpec). Re-train centroids only on drift — that is
    * the rebuild case by design, as in FAISS/IVF practice. */
  def appendIvfStore(spark: org.apache.spark.sql.SparkSession,
      path: String, shard: DataFrame, idCol: String,
      vecCol: String): String = {
    // ONE generation resolution: the shard assigns against the SAME
    // generation's centroids it appends into
    val root = currentStoreRoot(spark, path)
    val centroids = spark.read.parquet(s"$root/centroids")
    // a two-level store persisted its cid→gid mapping — appends MUST
    // replay it (frozen structure), or append ≢ rebuild at boundaries
    val assigned =
      if (fsOf(spark, root).exists(
          new org.apache.hadoop.fs.Path(s"$root/groups"))) {
        val rows = spark.read.parquet(s"$root/groups").collect()
        val mapping = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
        val probes = rows.head.getInt(2)
        ivfAssignTwoLevel(shard, centroids, idCol, vecCol, mapping, probes)
      } else ivfAssign(shard, centroids, idCol, vecCol)
    assigned
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
        col("centroid_id"))
      .repartition(col("centroid_id"))
      .write.mode("append").partitionBy("centroid_id")
      .parquet(s"$root/assigned")
    path
  }

  /** Scored IVF-store candidates (query_id, neighbor_id, cos) — the
    * shared serving core. For BATCH queries the probed cells are
    * collected and the assignment scan prunes to exactly those
    * `centroid_id=` directories (the `isin` is a partition filter —
    * pinned in PlanQualitySpec). For STREAMING queries the probe set
    * is unknown at plan time, so the full assignment joins
    * stream-static on `centroid_id` — the join filters to probed cells
    * at run time (stream-static joins get no dynamic partition
    * pruning); the probe projection itself is stateless and
    * append-legal. */
  def ivfStoreCandidates(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, idCol: String, vecCol: String,
      nProbe: Int = 4, excludeSelf: Boolean = true): DataFrame = {
    // ONE generation resolution per serve: centroids and cells come
    // from the same generation — the during-swap consistency law
    val path0 = currentStoreRoot(spark, path)
    val centroids = spark.read.parquet(s"$path0/centroids")
    val probesRaw =
      probeCentroids(queries, centroids, idCol, vecCol, nProbe)
        .select(col("query_id"), col("_qv"), col("centroid_id"))
    // batch serving consumes the probe set TWICE (collected for the
    // partition-pruning cell list, then joined) — materialize it once
    // so a non-trivial queries plan is not re-executed per use; it is
    // |queries|×nProbe rows, always small. Streaming probes stay lazy
    // (append-legal stateless projection).
    val probes =
      if (queries.isStreaming) probesRaw else probesRaw.localCheckpoint()
    val assigned = spark.read.parquet(s"$path0/assigned")
    val cells = if (queries.isStreaming) {
      assigned.withColumn("centroid_id", col("centroid_id").cast("long"))
    } else {
      val probedCells = probes.select("centroid_id").distinct()
        .collect().map(_.getLong(0))
      assigned
        // filter the RAW inferred (int) partition column with int
        // literals so the isin stays a clean partition filter (a cast
        // around the column can defeat pruning), THEN normalize to long
        .where(col("centroid_id").isin(probedCells.map(_.toInt): _*))
        .withColumn("centroid_id", col("centroid_id").cast("long"))
    }
    val joined =
      if (queries.isStreaming) probes.join(cells, Seq("centroid_id"))
      else cells.join(broadcast(probes), Seq("centroid_id"))
    val cands = joined
      .where(if (excludeSelf) col("query_id") =!= col("neighbor_id")
             else lit(true))
    cands.select(col("query_id"), col("neighbor_id"),
      (dot(col("_qv"), col("_cv")) /
        (sqrt(norm2(col("_qv"))) * sqrt(norm2(col("_cv"))))).as("cos"))
  }

  /** Serve top-k from a [[writeIvfStore]] store: probe the (collected,
    * tiny) centroid table, then scan ONLY the probed `centroid_id=`
    * directories and score exactly like [[topKIvf]]. */
  def topKIvfStore(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int = 4, excludeSelf: Boolean = true): DataFrame =
    rankTopK(ivfStoreCandidates(spark, path, queries, idCol, vecCol,
      nProbe, excludeSelf), k)

  /** query → its `nProbe` nearest coarse centroids (shared by
    * [[topKIvf]] and [[topKIvfPq]] — one implementation so tie-breaking
    * and casts cannot diverge). Returns one row per (query, probed
    * centroid): (query_id, _qv, centroid_id, _centroid).
    *
    * Same literal-unrolling as [[argminCentroid]], generalized to
    * top-nProbe: per-centroid d2 via the |v|²−2v·c+|c|² expansion (each
    * term ONE native codegen dot — the previous formulation crossJoined
    * ×C and evaluated an INTERPRETED zip_with/aggregate lambda per pair,
    * then shuffled every (query, centroid) row through a row_number
    * window: ×10 centroids meant ×10 interpreted work and ×10 shuffle,
    * the exact anti-scaling the r8 sf1 smoke caught), then one
    * array_sort over (d2, cid) structs — lexicographic, so ties break
    * to the lowest centroid id like the window's orderBy did — sliced
    * to nProbe and exploded. Zero shuffle, zero row amplification
    * beyond the nProbe fan-out; _centroid reattaches via a broadcast
    * equi-join on the tiny centroid table. */
  private def probeCentroids(queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, nProbe: Int): DataFrame = {
    val cents: Array[(Long, Array[Double])] = centroids.collect().map { r =>
      (r.getLong(r.fieldIndex("centroid_id")),
        r.getSeq[Number](r.fieldIndex("_centroid"))
          .map(_.doubleValue()).toArray)
    }
    val v = col(vecCol)
    val vN2 = norm2(v)
    val entries = cents.map { case (cid, cvec) =>
      val cLit = array(cvec.map(lit).toIndexedSeq: _*)
      val cN2 = cvec.foldLeft(0.0)((acc, x) => acc + x * x) // driver-side
      struct((vN2 - lit(2.0) * dot(v, cLit) + lit(cN2)).as("d2"),
        lit(cid).as("cid"))
    }
    val probed = slice(array_sort(array(entries.toIndexedSeq: _*)), 1,
      math.min(nProbe, cents.length))
    queries
      .select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
        explode(probed).as("_p"))
      .withColumn("centroid_id", col("_p").getField("cid"))
      .drop("_p")
      .join(broadcast(centroids), Seq("centroid_id"))
      .select(col("query_id"), col("_qv"), col("centroid_id"),
        col("_centroid"))
  }

  /** Per-code squared-norm literal table of one subspace codebook. */
  private def centsN2Lit(cents: Array[(Long, Array[Double])]): Column =
    array(cents.map { case (_, cv) =>
      lit(cv.foldLeft(0.0)((a, x) => a + x * x)) }.toIndexedSeq: _*)

  /** Embedding-cosine near-duplicate pairs, exact: all (a < b) pairs with
    * cosine >= threshold. Quadratic — the oracle-checkable baseline. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("_va"),
      sqrt(norm2(col(vecCol))).as("_na"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("_vb"),
      sqrt(norm2(col(vecCol))).as("_nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos",
        dot(col("_va"), col("_vb")) / (col("_na") * col("_nb")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 9).as("cos"))
  }

  // --- Product quantization (PQ / ADC) --------------------------------

  /** D4-style diversification (Tirumala et al. 2023, "D4: Improving LLM
    * Pretraining via Document De-Duplication and Diversification"): after
    * near-dup removal, the most PROTOTYPICAL documents of each semantic
    * cluster — highest cosine to their cluster centroid — are the
    * redundant "template mass"; dropping the top `dropFrac` per cluster
    * keeps the diverse tail that adds training signal.
    *
    * Plan shape: assignment and the proto score are ONE map-side literal
    * projection (the [[ivfAssign]] argmin plus a k-branch when-chain of
    * codegen dot products — zero shuffle, zero row amplification); the
    * per-cluster rank is one cluster-keyed exchange. The proto rank key
    * is 1e-9 long-quantized so partial-order ties cannot differ across
    * engines. At corpora where one cluster holds ~everything, replace the
    * rank window with a per-cluster count + GK quantile threshold and a
    * pure filter (the capPerGroup hatch); exact per-cluster rank is the
    * oracle-portable form.
    *
    * Output: (id, cluster, proto, kept) — `kept` = survives the drop. */
  def diversifyPrototypes(corpus: DataFrame, idCol: String, vecCol: String,
      nClusters: Int = 16, dropFrac: Double = 0.25, trainIters: Int = 0,
      seed: Long = 42L,
      centroidsOverride: Option[DataFrame] = None): DataFrame = {
    val centroidsDf = centroidsOverride.getOrElse(
      if (trainIters > 0)
        kmeansCentroids(corpus, idCol, vecCol, nClusters, trainIters, seed)
      else sampleCentroids(corpus, idCol, vecCol, nClusters, seed))
    val cents: Array[(Long, Array[Double])] = centroidsDf.collect().map { r =>
      val cid = r.getLong(r.fieldIndex("centroid_id"))
      val vec = r.getSeq[Number](r.fieldIndex("_centroid"))
        .map(_.doubleValue()).toArray
      (cid, vec)
    }
    val assigned = corpus
      .select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .withColumn("cluster", argminCentroid(col("_v"), cents))
    // cosine to the ASSIGNED centroid as a literal when-chain: |c| is a
    // driver-side left-to-right fold, same addition order as the oracle's
    // ordered SQL sum, so the double is bit-identical
    val proto = cents.foldLeft(lit(Double.NaN)) { case (acc, (cid, cvec)) =>
      val cLit = array(cvec.toIndexedSeq.map(lit): _*)
      val cNorm = math.sqrt(cvec.foldLeft(0.0)((a, x) => a + x * x))
      val denom = sqrt(norm2(col("_v"))) * lit(cNorm)
      when(col("cluster") === cid,
        when(denom === 0.0, 0.0).otherwise(dot(col("_v"), cLit) / denom))
        .otherwise(acc)
    }
    val scored = assigned.withColumn("proto", proto)
      .withColumn("_pq", round(col("proto") * lit(1e9), 0).cast("long"))
    val byCluster = Window.partitionBy(col("cluster"))
    val rn = row_number().over(
      byCluster.orderBy(col("_pq").desc, col("_id").asc))
    val cnt = count(lit(1)).over(byCluster)
    scored
      .select(col("_id").as(idCol), col("cluster"),
        round(col("proto"), 6).as("proto"),
        (rn > ceil(lit(dropFrac) * cnt)).as("kept"))
  }

  /** Per-subspace PQ codebook: `cents(s)` lists (code, centroid
    * subvector) for subspace `s`, codes dense 0..ksub-1; every subvector
    * has length `dsub`. */
  final case class PqCodebook(dsub: Int,
      cents: Array[Array[(Long, Array[Double])]]) {
    def m: Int = cents.length
  }

  /** Deterministic, SQL-derivable codebook: subspace centroids are the
    * subvector slices of the `ksub` lowest-id corpus rows (the oracle's
    * formulation — real deployments train with [[pqTrain]]). */
  def pqCodebookFromRows(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int): PqCodebook = {
    val rows = corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(ksub).collect()
    val vecs = rows.map(_.getSeq[Number](1).map(_.doubleValue()).toArray)
    val d = vecs.head.length
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    val dsub = d / m
    PqCodebook(dsub, Array.tabulate(m) { s =>
      vecs.zipWithIndex.map { case (v, c) =>
        (c.toLong, v.slice(s * dsub, (s + 1) * dsub)) }
    })
  }

  /** Train per-subspace codebooks with the distributed Lloyd's trainer
    * ([[kmeansCentroids]] over each subvector slice — m small k-means
    * problems instead of one d-dimensional one; that factorization is
    * the whole point of PQ). */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String, m: Int,
      ksub: Int, iters: Int = 5, seed: Long = 42L): PqCodebook = {
    val d = corpus.select(size(col(vecCol))).head().getInt(0)
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    val dsub = d / m
    PqCodebook(dsub, Array.tabulate(m) { s =>
      kmeansCentroids(
        corpus.select(col(idCol),
          slice(col(vecCol), s * dsub + 1, dsub).as("_sub")),
        idCol, "_sub", ksub, iters, seed)
        .collect()
        .map(r => (r.getLong(0),
          r.getSeq[Number](1).map(_.doubleValue()).toArray))
        .sortBy(_._1)
    })
  }

  /** ANN top-k via product quantization with asymmetric distance
    * computation (ADC, Jégou et al. 2011): corpus vectors are encoded as
    * m codes (nearest subspace centroid per m-way split of the vector);
    * a query scores a candidate by summing its per-subspace lookup-table
    * entries. Ranking score = approximate cosine
    * `q·v̂ / (|q|·|v̂|)` where `v̂` is the PQ reconstruction.
    *
    * The 100 TB story: the scored corpus representation is m codes plus
    * one norm (~20 bytes at m=4) instead of 4·d vector bytes (256 B at
    * d=64) — the candidate scan shrinks ~12× and per-candidate cost is m
    * table lookups instead of d multiplies; the encode is one
    * literal-argmin projection per subspace (zero shuffle, exactly
    * [[ivfAssign]]'s shape), and the top-k tail is the same bounded
    * partial aggregate as brute force. Compose with IVF probing
    * ([[topKIvf]]) for a full IVF-PQ index.
    *
    * Determinism: code assignment uses the |v|²−2v·c+|c|² expansion with
    * left-to-right folds and ties to the lowest code; the ADC sum folds
    * subspaces in order — every double is reproducible by the DuckDB
    * oracle's ordered aggregates. */
  def topKPq(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 4, ksub: Int = 16,
      codebookOverride: Option[PqCodebook] = None, trainIters: Int = 0,
      seed: Long = 42L, excludeSelf: Boolean = true): DataFrame = {
    val cb = codebookOverride.getOrElse(
      if (trainIters > 0) pqTrain(corpus, idCol, vecCol, m, ksub,
        trainIters, seed)
      else pqCodebookFromRows(corpus, idCol, vecCol, m, ksub))
    def sub(v: Column, s: Int): Column = slice(v, s * cb.dsub + 1, cb.dsub)
    // encode: slice each subvector ONCE (a first projection), then the
    // per-subspace literal argmin — hoisting the slices keeps the codegen
    // tree at m slice nodes instead of m × ksub
    val sliced = corpus.select(col(idCol).as("neighbor_id") +:
      (0 until cb.m).map(s => sub(col(vecCol), s).as(s"_sub$s")): _*)
    val codeCols = (0 until cb.m).map(s =>
      argminCentroid(col(s"_sub$s"), cb.cents(s)).as(s"_c$s"))
    val enc = sliced.select(col("neighbor_id") +: codeCols: _*)
    // reconstructed |v̂|: centroid-norm table lookup per chosen code
    def cn2Lit(s: Int): Column = centsN2Lit(cb.cents(s))
    val rn2 = (0 until cb.m).map(s =>
      element_at(cn2Lit(s), col(s"_c$s").cast("int") + 1)).reduce(_ + _)
    val encN = enc.withColumn("_rn", sqrt(rn2))
    // query LUTs: per-subspace dot with every centroid (m × ksub doubles
    // per query — computed once, broadcast); subvector slices hoisted as
    // on the corpus side
    def lutLit(s: Int): Column = array(cb.cents(s).map { case (_, cv) =>
      dot(col(s"_qsub$s"), array(cv.map(lit).toIndexedSeq: _*))
    }.toIndexedSeq: _*)
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
      .select(Seq(col("query_id"), col("_qv")) ++
        (0 until cb.m).map(s => sub(col("_qv"), s).as(s"_qsub$s")): _*)
      .select(Seq(col("query_id"), sqrt(norm2(col("_qv"))).as("_qn")) ++
        (0 until cb.m).map(s => lutLit(s).as(s"_lut$s")): _*))
    val joined = encN.join(q,
      if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
    val adot = (0 until cb.m).map(s =>
      element_at(col(s"_lut$s"), col(s"_c$s").cast("int") + 1)).reduce(_ + _)
    val scored = joined.withColumn("cos", adot / (col("_qn") * col("_rn")))
    rankTopK(scored, k)
  }

  /** Full IVF-PQ (the FAISS IVFPQ layout): coarse IVF assignment, PQ on
    * the RESIDUAL `v − coarse(v)`, query probes its `nProbe` nearest
    * coarse lists and scores candidates by ADC over the residual codes:
    *
    *   dot(q, v̂)  = q·c  +  Σ_s lut_s[code_s]          (lut = q_s · cent)
    *   |v̂|²       = |c|² + 2·Σ_s cross_s[cid][code_s] + Σ_s |cent|²
    *
    * where `cross` (coarse-subvector · codebook-centroid) is a driver-side
    * constant table of m × nCentroids × ksub doubles. Residual encoding is
    * what makes PQ accurate at scale: residuals are centered near zero, so
    * ksub codes cover them far more densely than the raw vectors.
    *
    * 100 TB shape: assignment + encode are literal-expression projections
    * (zero shuffle); candidates = nProbe/nCentroids of the corpus read as
    * m codes + cid per vector (combine with [[writeIvfIndex]] bucketing so
    * the scan prunes to the probed lists); the top-k tail is the bounded
    * partial aggregate. Verified by law, not oracle: the residual
    * summation order differs from the flat dot, so cos values agree only
    * to ~1 ulp — SimilaritySpec pins exact-reconstruction == brute force
    * on neighbor ranks with 1e-9 cos tolerance. */
  def topKIvfPq(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCentroids: Int = 16, nProbe: Int = 4,
      m: Int = 4, ksub: Int = 16, trainIters: Int = 0, seed: Long = 42L,
      excludeSelf: Boolean = true,
      centroidsOverride: Option[DataFrame] = None): DataFrame = {
    val centroids = centroidsOverride.getOrElse(
      if (trainIters > 0)
        kmeansCentroids(corpus, idCol, vecCol, nCentroids, trainIters, seed)
      else sampleCentroids(corpus, idCol, vecCol, nCentroids, seed))
    val cents = collectCents(centroids, "topKIvfPq")
    val cb = residualCodebook(corpus, idCol, vecCol, cents, m, ksub,
      trainIters, seed)
    adcTopK(encodeResidualPq(corpus, idCol, vecCol, cents, cb),
      ivfPqProbes(queries, idCol, vecCol, cents, cb, nProbe),
      cb.m, k, excludeSelf)
  }

  /** Collected coarse centroids, dense-0-based-checked: the literal
    * tables in the PQ chain index POSITIONALLY by centroid_id — a
    * sparse or non-zero-based set would silently fetch wrong centroids,
    * so fail loudly instead. */
  private def collectCents(centroids: DataFrame,
      who: String): Array[(Long, Array[Double])] = {
    val cents: Array[(Long, Array[Double])] = centroids.collect().map { r =>
      (r.getLong(r.fieldIndex("centroid_id")),
        r.getSeq[Number](r.fieldIndex("_centroid")).map(_.doubleValue()).toArray)
    }.sortBy(_._1)
    require(cents.iterator.map(_._1).zipWithIndex.forall {
        case (cid, i) => cid == i.toLong },
      s"$who needs dense 0-based centroid_ids, got ${
        cents.map(_._1).mkString(",")}")
    cents
  }

  private def centsLit(cents: Array[(Long, Array[Double])]): Column =
    array(cents.map { case (_, cv) =>
      array(cv.map(lit).toIndexedSeq: _*) }.toIndexedSeq: _*)

  /** Residual frame: _cid + (v − c) per corpus row — one projection. */
  private def residualFrame(corpus: DataFrame, idCol: String,
      vecCol: String, cents: Array[(Long, Array[Double])]): DataFrame =
    corpus.select(col(idCol), col(vecCol),
        argminCentroid(col(vecCol), cents).as("_cid"))
      .withColumn("_res", zip_with(col(vecCol),
        element_at(centsLit(cents), col("_cid").cast("int") + 1),
        (x, c) => x.cast("double") - c))

  /** Residual codebook: trained per subspace, or the ksub lowest-id
    * residuals (deterministic; ksub == |corpus| → exact reconstruction).
    * The from-rows path computes the ksub residuals DRIVER-side from the
    * cheap TakeOrdered of raw rows — running pqCodebookFromRows on the
    * residual frame would evaluate the argmin + subtraction projection
    * over the whole corpus just to discard all but ksub rows. The
    * arithmetic mirrors argminCentroid term for term ((|v|² − 2v·c) +
    * |c|², ties to the lowest code, left-to-right folds) so the codes
    * are identical. */
  private def residualCodebook(corpus: DataFrame, idCol: String,
      vecCol: String, cents: Array[(Long, Array[Double])], m: Int,
      ksub: Int, trainIters: Int, seed: Long): PqCodebook = {
    val d = cents.head._2.length
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    val dsub = d / m
    if (trainIters > 0)
      pqTrain(residualFrame(corpus, idCol, vecCol, cents), idCol, "_res",
        m, ksub, trainIters, seed)
    else {
      val raw = corpus.select(col(idCol), col(vecCol))
        .orderBy(col(idCol)).limit(ksub).collect()
        .map(_.getSeq[Number](1).map(_.doubleValue()).toArray)
      val residuals = raw.map { v =>
        val vn2 = v.foldLeft(0.0)((a, x) => a + x * x)
        var best = 0; var bestD2 = Double.PositiveInfinity
        cents.foreach { case (cid, cv) =>
          var dotvc = 0.0; var i = 0
          while (i < v.length) { dotvc += v(i) * cv(i); i += 1 }
          val cn2 = cv.foldLeft(0.0)((a, x) => a + x * x)
          val d2 = (vn2 - 2.0 * dotvc) + cn2
          if (d2 < bestD2) { bestD2 = d2; best = cid.toInt }
        }
        val cv = cents(best)._2
        Array.tabulate(v.length)(i => v(i) - cv(i))
      }
      PqCodebook(dsub, Array.tabulate(m) { s =>
        residuals.zipWithIndex.map { case (rv, c) =>
          (c.toLong, rv.slice(s * dsub, (s + 1) * dsub)) }
      })
    }
  }

  /** Residual-PQ ENCODE — the ~20-byte-per-vector representation the
    * serving scan reads: (neighbor_id, _cid, m codes, reconstruction
    * norm `_rn`). Assignment + encode are literal-expression projections
    * (zero shuffle). */
  private def encodeResidualPq(corpus: DataFrame, idCol: String,
      vecCol: String, cents: Array[(Long, Array[Double])],
      cb: PqCodebook): DataFrame = {
    val m = cb.m; val dsub = cb.dsub
    val resid = residualFrame(corpus, idCol, vecCol, cents)
    // encode residual subvectors (slices hoisted as in topKPq)
    val sliced = resid.select(col(idCol).as("neighbor_id") +: col("_cid") +:
      (0 until m).map(s => slice(col("_res"), s * dsub + 1, dsub).as(s"_sub$s")): _*)
    val codeCols = (0 until m).map(s =>
      argminCentroid(col(s"_sub$s"), cb.cents(s)).as(s"_c$s"))
    val enc = sliced.select(col("neighbor_id") +: col("_cid") +: codeCols: _*)
    // driver-side constant tables
    val coarseN2 = cents.map { case (_, cv) =>
      cv.foldLeft(0.0)((a, x) => a + x * x) }
    def subDot(a: Array[Double], off: Int, b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < b.length) { acc += a(off + i) * b(i); i += 1 }
      acc
    }
    val coarseN2Lit = array(coarseN2.map(lit).toIndexedSeq: _*)
    def crossLit(s: Int): Column = array(cents.map { case (_, cv) =>
      array(cb.cents(s).map { case (_, sub) =>
        lit(subDot(cv, s * dsub, sub)) }.toIndexedSeq: _*)
    }.toIndexedSeq: _*)
    def cn2Lit(s: Int): Column = centsN2Lit(cb.cents(s))
    val rn2 = element_at(coarseN2Lit, col("_cid").cast("int") + 1) +
      (0 until m).map(s => lit(2.0) *
        element_at(element_at(crossLit(s), col("_cid").cast("int") + 1),
          col(s"_c$s").cast("int") + 1)).reduce(_ + _) +
      (0 until m).map(s =>
        element_at(cn2Lit(s), col(s"_c$s").cast("int") + 1)).reduce(_ + _)
    enc.withColumn("_rn", sqrt(rn2))
  }

  /** Probe frame: query → its nProbe nearest coarse lists, carrying q·c,
    * |q|, and the per-subspace ADC lookup tables. */
  private def ivfPqProbes(queries: DataFrame, idCol: String,
      vecCol: String, cents: Array[(Long, Array[Double])],
      cb: PqCodebook, nProbe: Int): DataFrame = {
    val m = cb.m; val dsub = cb.dsub
    // rebuild the (tiny) centroid table locally so the probe stage reads
    // driver memory instead of re-executing the centroid scan per query
    // batch
    val spark = queries.sparkSession
    val centroidsLocal = {
      import spark.implicits._
      cents.toSeq.map { case (cid, cv) => (cid, cv.toSeq) }
        .toDF("centroid_id", "_centroid")
    }
    def lutLit(s: Int): Column = array(cb.cents(s).map { case (_, sub) =>
      dot(slice(col("_qv"), s * dsub + 1, dsub),
        array(sub.map(lit).toIndexedSeq: _*)) }.toIndexedSeq: _*)
    probeCentroids(queries, centroidsLocal, idCol, vecCol, nProbe)
      .select(Seq(col("query_id"), col("centroid_id").as("_cid"),
        sqrt(norm2(col("_qv"))).as("_qn"),
        dot(col("_qv"), col("_centroid")).as("_qc")) ++
        (0 until m).map(s => lutLit(s).as(s"_lut$s")): _*)
  }

  /** ADC join + score + rank — ONE implementation shared by the
    * in-memory chain ([[topKIvfPq]]) and the persisted store
    * ([[topKIvfPqStore]]), so their scores can never diverge. */
  private def adcTopK(encoded: DataFrame, probes: DataFrame, m: Int,
      k: Int, excludeSelf: Boolean): DataFrame = {
    val cands = encoded.join(broadcast(probes), Seq("_cid"))
      .where(if (excludeSelf) col("query_id") =!= col("neighbor_id")
             else lit(true))
    val adot = col("_qc") + (0 until m).map(s =>
      element_at(col(s"_lut$s"), col(s"_c$s").cast("int") + 1)).reduce(_ + _)
    rankTopK(cands.withColumn("cos", adot / (col("_qn") * col("_rn"))), k)
  }

  /** PQ-CODED persisted IVF store — what [[writeIvfStore]] should hold
    * at 100 TB: instead of raw embeddings per cell, the store keeps m
    * residual codes + one reconstruction norm per vector (~20 B at m=4
    * vs 4·d raw bytes) PARTITIONED BY coarse cell, plus the tiny
    * centroid table and the per-subspace codebooks. Serving
    * ([[topKIvfPqStore]]) probes the collected centroids and scans ONLY
    * the probed `_cid=` directories — and each directory is already
    * ~12× smaller than its raw-vector twin. Scores are result-identical
    * to [[topKIvfPq]] with the same parameters (shared encode/probe/ADC
    * implementations; doubles round-trip parquet losslessly). */
  def writeIvfPqStore(corpus: DataFrame, idCol: String, vecCol: String,
      path: String, nCentroids: Int = 16, m: Int = 4, ksub: Int = 16,
      trainIters: Int = 0, seed: Long = 42L,
      centroidsOverride: Option[DataFrame] = None): String = {
    val spark = corpus.sparkSession
    val centroids = centroidsOverride.getOrElse(
      if (trainIters > 0)
        kmeansCentroids(corpus, idCol, vecCol, nCentroids, trainIters, seed)
      else sampleCentroids(corpus, idCol, vecCol, nCentroids, seed))
    centroids.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/centroids")
    val cents = collectCents(centroids, "writeIvfPqStore")
    val cb = residualCodebook(corpus, idCol, vecCol, cents, m, ksub,
      trainIters, seed)
    locally {
      import spark.implicits._
      cb.cents.zipWithIndex.flatMap { case (subs, s) =>
        subs.map { case (code, sub) => (s, code, sub.toSeq) } }.toSeq
        .toDF("s", "code", "sub").coalesce(1)
        .write.mode("overwrite").parquet(s"$path/codebook")
    }
    encodeResidualPq(corpus, idCol, vecCol, cents, cb)
      .repartition(col("_cid")) // one writer set per cell dir
      .write.mode("overwrite").partitionBy("_cid")
      .parquet(s"$path/encoded")
    path
  }

  private def readPqStoreMeta(spark: org.apache.spark.sql.SparkSession,
      path: String): (Array[(Long, Array[Double])], PqCodebook) = {
    val cents = collectCents(spark.read.parquet(s"$path/centroids"),
      "readPqStoreMeta")
    val rows = spark.read.parquet(s"$path/codebook").collect()
    val m = rows.map(_.getInt(0)).max + 1
    val subs = Array.tabulate(m) { s =>
      rows.filter(_.getInt(0) == s)
        .map(r => (r.getLong(1),
          r.getSeq[Number](2).map(_.doubleValue()).toArray))
        .sortBy(_._1)
    }
    (cents, PqCodebook(subs.head.head._2.length, subs))
  }

  /** Incremental maintenance of a PQ store: a new shard encodes against
    * the store's FROZEN centroids and codebooks and appends into the
    * touched cell directories only. Because both assignment and code
    * selection are per-row argmins against frozen constants, any
    * sequence of appends is row-identical to one [[writeIvfPqStore]]
    * over the concatenated corpus with the same centroids + codebooks
    * (law-tested). Re-train only on drift — the rebuild case. */
  def appendIvfPqStore(spark: org.apache.spark.sql.SparkSession,
      path: String, shard: DataFrame, idCol: String,
      vecCol: String): String = {
    // one generation resolution: frozen meta and the appended cells
    // come from the same generation
    val root = currentStoreRoot(spark, path)
    val (cents, cb) = readPqStoreMeta(spark, root)
    encodeResidualPq(shard, idCol, vecCol, cents, cb)
      .repartition(col("_cid"))
      .write.mode("append").partitionBy("_cid")
      .parquet(s"$root/encoded")
    path
  }

  /** Serve top-k from a [[writeIvfPqStore]] store: probe the collected
    * centroids, scan ONLY the probed `_cid=` partition directories of
    * the coded table (the isin is a partition filter), ADC-score
    * exactly like [[topKIvfPq]]. */
  def topKIvfPqStore(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int = 4, excludeSelf: Boolean = true): DataFrame = {
    // one generation resolution per serve (the during-swap law)
    val path0 = currentStoreRoot(spark, path)
    val (cents, cb) = readPqStoreMeta(spark, path0)
    // batch serving consumes the probe set twice (the collected cell
    // list, then the join) — materialize once, it is |queries|×nProbe
    // rows
    val probes = ivfPqProbes(queries, idCol, vecCol, cents, cb, nProbe)
      .localCheckpoint()
    val probedCells = probes.select("_cid").distinct()
      .collect().map(_.getLong(0))
    val enc = spark.read.parquet(s"$path0/encoded")
      // filter the RAW inferred (int) partition column with int
      // literals so the isin stays a clean partition filter, THEN
      // normalize to long (the ivfStoreCandidates rule)
      .where(col("_cid").isin(probedCells.map(_.toInt): _*))
      .withColumn("_cid", col("_cid").cast("long"))
    adcTopK(enc, probes, cb.m, k, excludeSelf)
  }

  /** Near-dup pairs via sign-LSH blocking + exact verify — the scale path:
    * the pair space shrinks from O(n²) to pairs sharing a band bucket. */
  def cosineNearDupPairsLsh(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nPlanes: Int = 16, bitsPerBand: Int = 4,
      seed: Long = 42L): DataFrame = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    val planes = hyperplanes(nPlanes, dim, seed)
    val banded = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(norm2(col(vecCol))).as("n"),
      explode(lshBandKeys(col(vecCol), planes, bitsPerBand)).as("_b"))
      .select(col("id"), col("v"), col("n"), col("_b.band"), col("_b.key"))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.v").as("_va"), col("b.v").as("_vb"),
        col("a.n").as("_na"), col("b.n").as("_nb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos",
        dot(col("_va"), col("_vb")) / (col("_na") * col("_nb")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 9).as("cos"))
  }

  /** Symmetric per-vector int8 scalar quantization — the STORAGE tier of
    * a vector index (FAISS SQ8 / Lucene int8 HNSW convention): each
    * vector stores one float scale = max|v|/127 plus `dim` int8 codes,
    * a 4× shrink that is usually recall-lossless for cosine. Codes are
    * HALF_UP rounds of v/scale (scale 0 → all-zero codes), so
    * quantization is a pure projection — deterministic, engine-exact,
    * no data movement. Returns (idCol, scale, codes array<tinyint>
    * ... here int for portability). */
  def quantizeInt8(df: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val v = col(vecCol)
    val absmax = array_max(transform(v, x => abs(x.cast("double"))))
    df.select(col(idCol), (absmax / lit(127.0)).as("scale"), v.as("_v"))
      .select(col(idCol), col("scale"),
        transform(col("_v"), x => when(col("scale") === lit(0.0), lit(0.0))
          .otherwise(round(x.cast("double") / col("scale"), 0))
          .cast("int")).as("codes"))
  }

  /** Dequantized vector column from (scale, codes). */
  def dequantizeInt8(scale: Column, codes: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** Exact cosine top-k over the QUANTIZED corpus: queries stay
    * full-precision, corpus vectors reconstruct as code·scale — the
    * serving shape when the index holds int8 codes. Same output schema
    * and ranking convention as [[topKBruteForce]]; cosine is computed on
    * the reconstructed vectors, so results are deterministic and the
    * oracle replays the round-trip exactly. */
  def topKInt8(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, excludeSelf: Boolean = true): DataFrame = {
    val quant = quantizeInt8(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"),
        dequantizeInt8(col("scale"), col("codes")).as("_cv"))
      .select(col("neighbor_id"), col("_cv"),
        sqrt(norm2(col("_cv"))).as("_cn"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("_qv"), sqrt(norm2(col(vecCol))).as("_qn")))
    val joined = quant.join(q,
      if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
    val scored = joined.withColumn("cos",
      dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
    rankTopK(scored, k)
  }

  /** SemDeDup (Abbas et al. 2023): semantic deduplication at corpus
    * scale — coarse-cluster the embeddings, then within each cluster drop
    * every vector that has an earlier-id WITNESS above `tau` cosine.
    * (The paper keeps one representative per semantic-duplicate group;
    * the earlier-id witness rule is its deterministic single-pass
    * formulation — exactly one survivor per chain under any
    * partitioning.) Returns (idCol, cluster, kept).
    *
    * 100 TB shape: assignment is the literal-argmin projection of
    * [[ivfAssign]] (zero shuffle); the pair search shuffles narrow
    * (cluster, id, vec, norm) rows once on the cluster id and is
    * quadratic ONLY within a cluster — `nClusters` throttles the blowup
    * (the paper runs ~100k clusters at web scale, keeping clusters at
    * ~10k rows). A pathologically hot cluster re-clusters its members
    * with a second-level codebook (same operator, filtered input). The
    * dropped-id set is small by construction (it IS the duplicate mass),
    * so the final annotation join broadcasts. */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
      nClusters: Int = 16, tau: Double = 0.95, trainIters: Int = 0,
      seed: Long = 42L,
      centroidsOverride: Option[DataFrame] = None): DataFrame = {
    val centroids = broadcast(centroidsOverride.getOrElse(
      if (trainIters > 0)
        kmeansCentroids(corpus, idCol, vecCol, nClusters, trainIters, seed)
      else sampleCentroids(corpus, idCol, vecCol, nClusters, seed)))
    val assigned = ivfAssign(corpus, centroids, idCol, vecCol)
      .select(col(idCol).as("_id"), col(vecCol).as("_v"),
        col("centroid_id").as("cluster"))
      .withColumn("_n", sqrt(norm2(col("_v"))))
    val a = assigned.select(col("cluster"), col("_id").as("_ida"),
      col("_v").as("_va"), col("_n").as("_na"))
    val b = assigned.select(col("cluster"), col("_id").as("_idb"),
      col("_v").as("_vb"), col("_n").as("_nb"))
    // the witness pair join: same-cluster, earlier id, cosine >= tau.
    // localCheckpoint makes the small dropped set concrete so the final
    // join's broadcast estimate is exact (and the self-join never re-runs)
    val dropped = a.join(b, Seq("cluster"))
      .where(col("_ida") < col("_idb") &&
        dot(col("_va"), col("_vb")) / (col("_na") * col("_nb")) >= tau)
      .select(col("_idb").as("_id")).distinct()
      .withColumn("_dropped", lit(true))
      .localCheckpoint(true)
    assigned.select(col("_id"), col("cluster"))
      .join(broadcast(dropped), Seq("_id"), "left")
      .select(col("_id").as(idCol), col("cluster"),
        col("_dropped").isNull.as("kept"))
  }

  /** Johnson-Lindenstrauss random projection to `outDim` dimensions —
    * the cheap distance-preserving shrink applied before ANN indexing or
    * pairwise dedup when the source embedding is wide (Achlioptas 2003:
    * a dense +-1 sign matrix preserves pairwise distances in
    * expectation with the same JL guarantee as Gaussian entries).
    *
    * Deterministic and engine-portable by construction: sign(k, j)
    * comes from the repo's portable LCG hash of k*inDim + j — the same
    * constants [[Sampling.portableHash]] uses — so an external engine
    * regenerates the matrix from two integers, and each output
    * coordinate is the native left-to-right [[dot]] against a literal
    * sign row, scaled once by the driver-computed 1/sqrt(outDim)
    * double (both replayed exactly by the oracle's ordered SUM).
    *
    * Scale shape: a PURE PROJECTION — no shuffle, no join, no state;
    * the sign rows ride into every task as plan literals (outDim x
    * inDim doubles, KBs). Returns (id, k, y) long-form rows. */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
      inDim: Int, outDim: Int): DataFrame = {
    require(inDim > 0 && outDim > 0 && outDim <= inDim,
      s"need 0 < outDim <= inDim, got $inDim -> $outDim")
    val M = 2147483648L; val A = 1103515245L; val C = 12345L
    def sign(idx: Long): Double =
      if (((idx % M) * A + C) % M < M / 2) 1.0 else -1.0
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val ys = (0 until outDim).map { k =>
      val signs = Array.tabulate(inDim)(j => sign(k.toLong * inDim + j))
      (dot(col(vecCol), lit(signs)) * lit(scale)).as(s"_y$k")
    }
    df.select(col(idCol) +: ys: _*)
      .select(col(idCol), posexplode(
        array((0 until outDim).map(k => col(s"_y$k")): _*)).as(Seq("k", "y")))
  }
}
