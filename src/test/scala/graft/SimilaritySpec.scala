package graft

import graft.text.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  lazy val tiny = Seq(
    (0L, vec(1, 0, 0, 0)), (1L, vec(0.9, 0.1, 0, 0)),
    (2L, vec(0, 1, 0, 0)), (3L, vec(0, 0.9, 0.1, 0)),
    (4L, vec(0, 0, 1, 0))).toDF("vec_id", "embedding")

  test("native codegen dot product is bit-identical to the HOF fold") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(50)((
      Array.fill(64)(rnd.nextGaussian().toFloat),
      Array.fill(64)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("a", "b")
    val r = df.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof")).collect()
    r.foreach(row => assert(row.getDouble(0) == row.getDouble(1),
      "native and HOF dot must agree bit-for-bit"))
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq((vec(1, 2, 3), vec(1, 2, 3), vec(3, -1.5, 0)))
      .toDF("a", "b", "c")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")),
      Similarity.cosine(col("a"), col("c"))).head()
    r.getDouble(0) shouldBe 1.0 +- 1e-12
    r.getDouble(1) shouldBe 0.0 +- 1e-12
  }

  test("brute-force top-k returns nearest neighbors in rank order") {
    val r = Similarity.topKBruteForce(tiny, tiny.where(col("vec_id") === 0),
      "vec_id", "embedding", k = 2)
    val got = r.orderBy("rank").collect()
      .map(row => (row.getInt(1), row.getLong(2)))
    got shouldBe Array((1, 1L), (2, 2L)) // 1 is closest to 0, then 2 (tie-broken)
  }

  test("LSH ANN achieves high recall@3 vs brute force on clustered vectors") {
    // 3 clusters of 20 vectors each around orthogonal-ish axes
    val rnd = new scala.util.Random(7)
    val rows = for {
      c <- 0 until 3; i <- 0 until 20
    } yield {
      val base = Array.fill(16)(0.0); base(c * 5) = 1.0
      (c * 100L + i, base.map(v => (v + rnd.nextGaussian() * 0.05).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id").isin(0L, 100L, 200L))
    val exact = Similarity.topKBruteForce(df, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.topKLsh(df, queries, "vec_id", "embedding", 3,
      nPlanes = 16, bitsPerBand = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    recall should be >= 0.8
  }

  test("IVF ANN: probing all centroids equals brute force") {
    val all = Similarity.topKIvf(tiny, tiny.where(col("vec_id") === 0),
      "vec_id", "embedding", k = 2, nCentroids = 4, nProbe = 4)
      .orderBy("rank").collect().map(r => r.getLong(2))
    all shouldBe Array(1L, 2L)
  }

  test("IVF ANN with nProbe=1 returns neighbors from the probed list only") {
    val r = Similarity.topKIvf(tiny, tiny.where(col("vec_id") === 0),
      "vec_id", "embedding", k = 4, nCentroids = 2, nProbe = 1)
    // all results come from one coarse list; rank is still cosine-ordered
    val ranks = r.orderBy("rank").collect().map(_.getInt(1))
    ranks shouldBe (1 to ranks.length).toArray
  }

  test("cosine near-dup pairs: exact and LSH-blocked agree on strong dups") {
    val dup = Seq(
      (0L, vec(1, 0, 0, 0)), (1L, vec(0.999, 0.001, 0, 0)),
      (2L, vec(0, 1, 0, 0))).toDF("vec_id", "embedding")
    val exact = Similarity.cosineNearDupPairs(dup, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exact shouldBe Set((0L, 1L))
    val lsh = Similarity.cosineNearDupPairsLsh(dup, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    lsh shouldBe Set((0L, 1L))
  }

  test("k-means refinement converges to the true cluster means") {
    // three tight, well-separated clusters in 4-D; sampled init will pick
    // arbitrary members — Lloyd's rounds must move centroids to the means
    def cluster(base: Array[Double], n: Int, off: Double) =
      (0 until n).map(i => base.zipWithIndex.map { case (v, j) =>
        (v + (if (j == i % 4) off else 0.0)).toFloat }.toSeq)
    val a = cluster(Array(10.0, 0, 0, 0), 8, 0.2)
    val b = cluster(Array(0.0, 10, 0, 0), 8, 0.2)
    val c = cluster(Array(0.0, 0, 10, 0), 8, 0.2)
    val df = (a ++ b ++ c).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    val trained = Similarity.kmeansCentroids(df, "vec_id", "embedding",
      nCentroids = 3, iters = 8)
      .collect().map(_.getSeq[Double](1).toArray)
    // every true cluster mean has a trained centroid within 0.3
    for (mean <- Seq(Array(10.05, 0.05, 0.05, 0.05),
        Array(0.05, 10.05, 0.05, 0.05), Array(0.05, 0.05, 10.05, 0.05))) {
      val best = trained.map(t =>
        math.sqrt(t.zip(mean).map { case (x, y) => (x - y) * (x - y) }.sum)).min
      best should be < 0.3
    }
    // deterministic under repartitioning (decimal component sums)
    val again = Similarity.kmeansCentroids(df.repartition(7), "vec_id",
      "embedding", nCentroids = 3, iters = 8)
      .collect().map(_.getSeq[Double](1).toSeq).toSet
    trained.map(_.toSeq).toSet shouldBe again
  }

  test("k-means refinement does not hurt IVF recall; trained full-probe equals brute force") {
    // with nProbe == nCentroids the probed set is the whole corpus, so the
    // trained index must reproduce brute force exactly — same guarantee as
    // the sampled-centroid path
    val bf = Similarity.topKBruteForce(tiny, tiny, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val ivf = Similarity.topKIvf(tiny, tiny, "vec_id", "embedding", 3,
      nCentroids = 2, nProbe = 2, trainIters = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    ivf shouldBe bf
  }

  test("knnJoinIvf with full probing equals the brute-force self-join") {
    // nProbe == nCentroids → every cell probed → must match exact kNN
    val bf = Similarity.topKBruteForce(tiny, tiny, "vec_id", "embedding", 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val knn = Similarity.knnJoinIvf(tiny, "vec_id", "embedding", k = 2,
      nCentroids = 2, nProbe = 2, trainIters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    knn shouldBe bf
  }

  test("knnJoinIvf is salt-invariant: saltFactor 1 and 3 agree bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val df = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    def run(s: Int) = Similarity.knnJoinIvf(df, "vec_id", "embedding",
        k = 3, nCentroids = 4, nProbe = 2, saltFactor = s)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    run(1) shouldBe run(3)
  }

  test("PQ with every vector its own centroid reproduces brute force exactly") {
    // m=1, ksub=|corpus|: each vector's nearest "subspace centroid" is
    // itself, so the reconstruction is exact and ADC == exact cosine —
    // ranks AND rounded cos values must match brute force bit-for-bit
    val bf = Similarity.topKBruteForce(tiny, tiny, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val pq = Similarity.topKPq(tiny, tiny, "vec_id", "embedding", 3,
      m = 1, ksub = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    pq shouldBe bf
  }

  test("PQ ADC retrieves neighbors from the query's own cluster") {
    // PQ's guarantee is coarse: quantization error (~codebook cell size)
    // exceeds the within-cluster noise, so exact rank order inside a
    // cluster is not preserved — but every retrieved neighbor must come
    // from the query's cluster, whose centroids are far apart
    val rnd = new scala.util.Random(11)
    val rows = for {
      c <- 0 until 4; i <- 0 until 20
    } yield {
      val base = Array.fill(16)(0.0); base(c * 4) = 1.0
      (c * 100L + i, base.map(v => (v + rnd.nextGaussian() * 0.05).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id").isin(0L, 100L, 200L, 300L))
    // trained codebook: m=4 subspaces of 4 dims, 8 codes each
    val ann = Similarity.topKPq(df, queries, "vec_id", "embedding", 3,
      m = 4, ksub = 8, trainIters = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    ann should have size 12 // 4 queries × k=3
    ann.foreach { case (q, n) => n / 100 shouldBe q / 100 }
  }

  test("IVF-PQ with exact reconstruction equals brute force (full probe, full codebook)") {
    // residual codebook = every residual (ksub == |corpus|) → exact
    // reconstruction; nProbe == nCentroids → all lists probed. Ranks must
    // match brute force; cos only to ~1 ulp (the residual split changes
    // the dot's summation order), hence the 1e-9 tolerance.
    val rnd = new scala.util.Random(17)
    val rows = (0 until 12).map(i =>
      (i.toLong, Array.fill(4)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val q = df.where(col("vec_id") < 3)
    val bf = Similarity.topKBruteForce(df, q, "vec_id", "embedding", 4)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getDouble(3)))).toMap
    val ivfpq = Similarity.topKIvfPq(df, q, "vec_id", "embedding", 4,
      nCentroids = 3, nProbe = 3, m = 2, ksub = 12)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getDouble(3)))).toMap
    ivfpq.keySet shouldBe bf.keySet
    ivfpq.foreach { case (k2, (nid, cos)) =>
      nid shouldBe bf(k2)._1
      cos shouldBe bf(k2)._2 +- 1e-9
    }
  }

  test("IVF-PQ retrieves neighbors from the query's own cluster") {
    val rnd = new scala.util.Random(19)
    val rows = for {
      c <- 0 until 4; i <- 0 until 20
    } yield {
      val base = Array.fill(16)(0.0); base(c * 4) = 1.0
      (c * 100L + i, base.map(v => (v + rnd.nextGaussian() * 0.05).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id").isin(0L, 100L, 200L, 300L))
    val ann = Similarity.topKIvfPq(df, queries, "vec_id", "embedding", 3,
      nCentroids = 4, nProbe = 2, m = 4, ksub = 8, trainIters = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    ann should have size 12
    ann.foreach { case (qid, n) => n / 100 shouldBe qid / 100 }
  }

  test("PQ encode/score is deterministic under repartitioning") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 60).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val q = df.where(col("vec_id") < 3)
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.topKPq(d, q, "vec_id", "embedding", 5, m = 4, ksub = 8)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
    run(df) shouldBe run(df.repartition(7))
  }

  test("int8 quantization: bounded error, zero-vector safe, high recall") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 40L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))) :+
      (99L, Array.fill(16)(0.0f))
    val df = rows.toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(df, "vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Int](2).toArray)).toList
    q.foreach { case (id, scale, codes) =>
      codes.foreach(c => math.abs(c) should be <= 127)
      if (id == 99L) { scale shouldBe 0.0; codes.sum shouldBe 0 }
    }
    // round-trip error per component bounded by scale/2
    val src = rows.toMap
    q.filter(_._1 != 99L).foreach { case (id, scale, codes) =>
      codes.zip(src(id)).foreach { case (c, v) =>
        math.abs(c * scale - v) should be <= (scale / 2 + 1e-12) }
    }
    // int8 ranking matches full precision on well-separated data
    val sep = (0L until 30L).map { i =>
      val base = Array.fill(8)(0.0f); base((i % 3).toInt) = 1.0f
      (i, base.map(x => x + rnd.nextGaussian().toFloat * 0.01f))
    }.toDF("vec_id", "embedding")
    val full = Similarity.topKBruteForce(sep, sep.where(col("vec_id") < 3),
        "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val int8 = Similarity.topKInt8(sep, sep.where(col("vec_id") < 3),
        "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (full intersect int8).size should be >= 13 // >= 85% recall
  }

  test("semDedup drops later-id witnesses within a cluster only") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),  // cluster 0, kept (earliest)
      (2L, Array(2.0f, 0.0f)),  // cos=1 with v1 -> dropped
      (3L, Array(0.0f, 1.0f)),  // cluster 1, kept
      (4L, Array(0.0f, 3.0f)),  // cos=1 with v3 -> dropped
      (5L, Array(-1.0f, 0.1f))  // cluster 1 or 0 but anti-parallel: kept
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("centroid_id", "_centroid")
    val out = Similarity.semDedup(df, "vec_id", "embedding",
        tau = 0.95, centroidsOverride = Some(cents))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    out(1L) shouldBe ((0L, true))
    out(2L) shouldBe ((0L, false))
    out(3L) shouldBe ((1L, true))
    out(4L) shouldBe ((1L, false))
    out(5L)._2 shouldBe true // negative cosine never witnesses
    // deterministic under repartitioning
    val again = Similarity.semDedup(df.repartition(5), "vec_id",
        "embedding", tau = 0.95, centroidsOverride = Some(cents))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    again shouldBe out
  }

  test("diversifyPrototypes drops exactly the most prototypical fraction " +
      "per cluster, deterministically") {
    // cluster 0: four vectors at decreasing alignment with e1; cluster 1:
    // two vectors near e2. dropFrac=0.5 -> ceil(2) dropped in cluster 0,
    // ceil(1) in cluster 1 — always the HIGHEST-cosine rows.
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),   // cos=1.000 -> rank 1, dropped
      (2L, Array(1.0f, 0.1f)),   // cos~0.995 -> rank 2, dropped
      (3L, Array(1.0f, 0.5f)),   // cos~0.894 -> rank 3, kept
      (4L, Array(1.0f, 0.9f)),   // cos~0.743 -> rank 4, kept
      (5L, Array(0.0f, 1.0f)),   // cluster 1 cos=1 -> dropped
      (6L, Array(0.3f, 1.0f))    // cluster 1 cos~0.958 -> kept
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("centroid_id", "_centroid")
    val out = Similarity.diversifyPrototypes(df, "vec_id", "embedding",
        dropFrac = 0.5, centroidsOverride = Some(cents))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    out(1L)._3 shouldBe false
    out(2L)._3 shouldBe false
    out(3L)._3 shouldBe true
    out(4L)._3 shouldBe true
    out(5L) shouldBe ((1L, 1.0, false))
    out(6L)._1 shouldBe 1L
    out(6L)._3 shouldBe true
    out(1L)._2 shouldBe 1.0 // exactly aligned
    // deterministic under repartitioning
    val again = Similarity.diversifyPrototypes(df.repartition(5), "vec_id",
        "embedding", dropFrac = 0.5, centroidsOverride = Some(cents))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    again shouldBe out
  }

  test("randomProject: shape, norm preservation in expectation, " +
      "partition-invariant") {
    val rnd = new scala.util.Random(7)
    val df = (0L until 50L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) = graft.text.Similarity
      .randomProject(d, "vec_id", "embedding", inDim = 64, outDim = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    val out = run(df)
    out.size shouldBe 50 * 16
    // JL with +-1 signs preserves norms in expectation: the MEAN ratio
    // of projected to original squared norm over 50 gaussian vectors
    // concentrates near 1 (deterministic — the matrix is fixed by hash)
    val orig = df.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(v => v.toDouble * v).sum).toMap
    val ratios = (0L until 50L).map { i =>
      val p = (0 until 16).map(k => out((i, k))).map(y => y * y).sum
      p / orig(i)
    }
    (ratios.sum / 50) shouldBe (1.0 +- 0.2)
    run(df.repartition(7)) shouldBe out
  }

  test("ANN recall law: probing every cell recovers the exact top-k " +
      "(recall 1.0); fewer probes can only lose neighbors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(3)
    val df = (0L until 200L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat))).toDF("id", "v")
    val q = df.where(col("id") < 5)
    def pairSet(nProbe: Int): Set[(Long, Long)] = {
      val w = org.apache.spark.sql.expressions.Window.orderBy("id")
      val cents = df.orderBy("id").limit(8)
        .select((row_number().over(w) - 1).cast("long").as("centroid_id"),
          col("v").as("_centroid"))
      Similarity.topKIvf(df, q, "id", "v", k = 4, nCentroids = 8,
          nProbe = nProbe, centroidsOverride = Some(cents))
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    }
    val exact = Similarity.topKBruteForce(df, q, "id", "v", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    pairSet(8) shouldBe exact // all cells probed == brute force
    // recall is MONOTONE in nProbe: an exact-top-k member inside the
    // candidate set is always inside the reported top-k (it beats every
    // candidate), and candidate sets nest as probes grow — so hits can
    // only increase. (Partial probing can SUBSTITUTE other neighbors —
    // the reported set is not a subset of exact, only its hits are.)
    val hits = Seq(1, 2, 4, 8).map(p => (pairSet(p) & exact).size)
    hits shouldBe hits.sorted
    hits.last shouldBe exact.size
  }

  test("IVF-PQ recall law: with an exact residual codebook, hits vs " +
      "brute force are monotone in nProbe and full probe reaches " +
      "recall 1.0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(23)
    val df = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat))).toDF("id", "v")
    val q = df.where(col("id") < 4)
    val w = org.apache.spark.sql.expressions.Window.orderBy("id")
    val cents = df.orderBy("id").limit(6)
      .select((row_number().over(w) - 1).cast("long").as("centroid_id"),
        col("v").as("_centroid"))
    // ksub == |corpus| → every residual is its own codeword → ADC
    // scoring is exact (±1 ulp), so the IVF monotonicity argument
    // applies: candidate sets nest as probes grow and an exact-top-k
    // member among the candidates always wins its slot
    def pairSet(nProbe: Int): Set[(Long, Long)] =
      Similarity.topKIvfPq(df, q, "id", "v", k = 4, nCentroids = 6,
          nProbe = nProbe, m = 2, ksub = 60,
          centroidsOverride = Some(cents))
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = Similarity.topKBruteForce(df, q, "id", "v", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = Seq(1, 2, 4, 6).map(p => (pairSet(p) & exact).size)
    hits shouldBe hits.sorted
    hits.last shouldBe exact.size
  }

  test("rankingMetrics: worked example (MRR, DCG@k, nDCG@k)") {
    import spark.implicits._
    // ranking by (score desc, id): d3(g2), d1(g1), d2(g3), d4(g1)
    // relevant (g >= 2): d3 rank 1, d2 rank 3 → MRR = 1
    val scored = Seq(
      (1L, 1L, 5.0), (2L, 3L, 3.0), (3L, 2L, 9.0), (4L, 1L, 1.0))
      .toDF("doc_id", "n_terms", "score")
    val m = graft.text.Search.rankingMetrics(scored, "doc_id", k = 3,
      relMinTerms = 2).head()
    val d = graft.text.Search.dcgDiscounts(3)
    m.getLong(0) shouldBe 4   // n_matched
    m.getLong(1) shouldBe 2   // n_relevant
    m.getLong(2) shouldBe 1   // first_rel_rank (d3 tops the ranking)
    m.getDouble(3) shouldBe 1.0 // mrr
    m.getDouble(4) shouldBe (2.0 * d(0) + 1.0 * d(1) + 3.0 * d(2)) // dcg
    m.getDouble(5) shouldBe (3.0 * d(0) + 2.0 * d(1))              // idcg
    m.getDouble(6) shouldBe m.getDouble(4) / m.getDouble(5)
    // no relevant rows → zeros, no division by idcg
    val none = graft.text.Search.rankingMetrics(scored, "doc_id", k = 3,
      relMinTerms = 99).head()
    none.getLong(2) shouldBe 0
    none.getDouble(3) shouldBe 0.0
    none.getDouble(6) shouldBe 0.0
  }

  test("appendIvfStore: incremental appends == one full build with the " +
      "same centroids; only touched cell directories gain files") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def mk(ids: Range) = ids.map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val base = mk(0 until 40)
    val shard1 = mk(40 until 52)
    val shard2 = mk(52 until 64)
    val incDir = java.nio.file.Files.createTempDirectory("ivf-inc").toString
    val fullDir = java.nio.file.Files.createTempDirectory("ivf-full").toString
    Similarity.writeIvfStore(base, "vec_id", "embedding", s"$incDir/idx",
      nCentroids = 8)
    Similarity.appendIvfStore(spark, s"$incDir/idx", shard1, "vec_id",
      "embedding")
    Similarity.appendIvfStore(spark, s"$incDir/idx", shard2, "vec_id",
      "embedding")
    // rebuild over the concatenated corpus with the SAME frozen centroids
    val frozen = spark.read.parquet(s"$incDir/idx/centroids")
    Similarity.writeIvfStore(base.union(shard1).union(shard2), "vec_id",
      "embedding", s"$fullDir/idx", centroidsOverride = Some(frozen))
    val q = base.where(col("vec_id") < 4)
    val inc = Similarity.topKIvfStore(spark, s"$incDir/idx", q,
      "vec_id", "embedding", k = 3, nProbe = 3)
    val full = Similarity.topKIvfStore(spark, s"$fullDir/idx", q,
      "vec_id", "embedding", k = 3, nProbe = 3)
    rowSet(inc) shouldBe rowSet(full)
    // the assignment row sets agree too (append changed nothing else)
    rowSet(spark.read.parquet(s"$incDir/idx/assigned")) shouldBe
      rowSet(spark.read.parquet(s"$fullDir/idx/assigned"))
  }

  test("marginMine: exact-match pair tops the margins, hub vectors are " +
      "normalized down, threshold filters, pairs = union of both lists") {
    // src 0 == tgt 1 exactly; tgt 3 is a HUB roughly equidistant from
    // both srcs; src 2 has no exact partner
    val src = Seq((0L, vec(1, 0, 0, 0)), (2L, vec(0, 1, 0, 0)))
      .toDF("vec_id", "embedding")
    val tgt = Seq(
      (1L, vec(1, 0, 0, 0)),        // exact partner of src 0
      (3L, vec(0.6, 0.6, 0.1, 0)),  // hub: close-ish to both srcs
      (5L, vec(0.1, 0.8, 0, 0)))    // partner-ish of src 2
      .toDF("vec_id", "embedding")
    val out = Similarity.marginMine(src, tgt, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    val byPair = out.map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    // the exact pair has cos 1 and the highest margin of src 0's pairs
    byPair((0L, 1L))._1 shouldBe 1.0 +- 1e-9
    val m01 = byPair((0L, 1L))._2
    out.filter(_._1 == 0L).map(_._4).max shouldBe m01
    // hub normalization: the hub's cos to src 0 is high in absolute
    // terms but its margin stays below the exact pair's
    byPair.get((0L, 3L)).foreach(_._2 should be < m01)
    // every forward pair (k=2 per src, 2 srcs) and backward pair is
    // present exactly once
    out.map(t => (t._1, t._2)).distinct.length shouldBe out.length
    out.length should be >= 4
    // threshold keeps only pairs at/above it
    val thr = Similarity.marginMine(src, tgt, "vec_id", "embedding",
      k = 2, threshold = m01)
    thr.collect().map(_.getDouble(3)).foreach(_ should be >= m01)
    thr.count() should be >= 1L
  }

  test("PQ store laws: serving == in-memory topKIvfPq bit-for-bit, " +
      "append ≡ rebuild against frozen centroids + codebooks, and the " +
      "serving scan prunes to the probed cell directories") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 80).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val q = df.where(col("vec_id") < 4)
    def res(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

    val p = java.nio.file.Files
      .createTempDirectory("graft_pqstore_").toString
    Similarity.writeIvfPqStore(df, "vec_id", "embedding", p,
      nCentroids = 8, m = 4, ksub = 16)
    val mem = Similarity.topKIvfPq(df, q, "vec_id", "embedding", k = 3,
      nCentroids = 8, nProbe = 3, m = 4, ksub = 16)
    val store = Similarity.topKIvfPqStore(spark, p, q, "vec_id",
      "embedding", k = 3, nProbe = 3)
    res(store) shouldBe res(mem)

    // append ≡ rebuild against the FROZEN centroids + codebooks: build
    // on the first half with the FULL build's centroids pinned (frozen
    // constants are the law's premise — a half-corpus sample would pick
    // different coarse centroids); the codebook derives from the 16
    // lowest-id rows, which the half shares with the full corpus
    val p2 = java.nio.file.Files
      .createTempDirectory("graft_pqstore2_").toString
    Similarity.writeIvfPqStore(df.where(col("vec_id") < 40),
      "vec_id", "embedding", p2, nCentroids = 8, m = 4, ksub = 16,
      centroidsOverride = Some(spark.read.parquet(s"$p/centroids")))
    Similarity.appendIvfPqStore(spark, p2,
      df.where(col("vec_id") >= 40), "vec_id", "embedding")
    res(Similarity.topKIvfPqStore(spark, p2, q, "vec_id", "embedding",
      k = 3, nProbe = 3)) shouldBe res(store)

    // partition pruning: the probed-cell isin lands as a PARTITION
    // filter on the encoded scan — selected cell directories < all
    // (inputFiles would lie here: it lists pre-pruning)
    val one = Similarity.topKIvfPqStore(spark, p,
      df.where(col("vec_id") === 0L), "vec_id", "embedding",
      k = 3, nProbe = 2)
    def leaves(pl: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      pl.collectLeaves().flatMap {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          leaves(a.executedPlan)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          leaves(qs.plan)
        case l => Seq(l)
      }
    val scans = leaves(one.queryExecution.executedPlan)
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.mkString.contains("encoded") => f }
    scans should have size 1
    scans.head.selectedPartitions.partitionCount shouldBe 2
    val allCells = spark.read.parquet(s"$p/encoded")
      .queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }.sum
    allCells should be > 2
  }

  // --------------------------------------- r11: drift → retrain → swap

  test("rebuildIvfStore: retrain + ATOMIC generation swap — serving " +
      "resolves one generation (old or new, never a mix), appends land " +
      "in the current generation, uncommitted gens are invisible, " +
      "vacuum retires the rest") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    def mk(ids: Range) = ids.map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val corpus = mk(0 until 60)
    val dir = java.nio.file.Files.createTempDirectory("ivf-gen").toString
    val idx = s"$dir/idx"
    Similarity.writeIvfStore(corpus, "vec_id", "embedding", idx,
      nCentroids = 6)
    val q = corpus.where(col("vec_id") < 4)
    def serve() = rowSet(Similarity.topKIvfStore(spark, idx, q,
      "vec_id", "embedding", k = 3, nProbe = 6))
    // full-probe serving == brute force, before AND after the retrain
    val brute = rowSet(Similarity.topKBruteForce(corpus, q,
      "vec_id", "embedding", k = 3))
    serve() shouldBe brute
    // an UNCOMMITTED generation (crashed rebuild) is invisible
    new java.io.File(s"$idx/gen-99/assigned").mkdirs()
    Similarity.currentStoreRoot(spark, idx) shouldBe idx
    serve() shouldBe brute
    // a reader that resolved the OLD generation keeps a consistent
    // view across the swap (its files are untouched until vacuum)
    val oldRoot = Similarity.currentStoreRoot(spark, idx)
    val gen = Similarity.rebuildIvfStore(spark, idx, nCentroids = 6,
      trainIters = 2)
    gen should include("gen-100") // next after the dead gen-99
    Similarity.currentStoreRoot(spark, idx) shouldBe gen
    spark.read.parquet(s"$oldRoot/assigned").count() shouldBe 60L
    // retrained serving still equals brute force at full probe (the
    // corpus is unchanged — only the partitioning moved)
    serve() shouldBe brute
    // appends now land in the CURRENT generation only
    val before = spark.read.parquet(s"$gen/assigned").count()
    val shard = mk(60 until 70)
    Similarity.appendIvfStore(spark, idx, shard, "vec_id", "embedding")
    spark.read.parquet(s"$gen/assigned").count() shouldBe (before + 10)
    spark.read.parquet(s"$oldRoot/assigned").count() shouldBe 60L
    // vacuum retires the legacy flat layout + dead gens, keeps current
    Similarity.vacuumIvfStore(spark, idx) should be >= 2
    new java.io.File(s"$idx/assigned").exists() shouldBe false
    new java.io.File(s"$idx/gen-99").exists() shouldBe false
    rowSet(Similarity.topKIvfStore(spark, idx, q, "vec_id", "embedding",
      k = 3, nProbe = 6)) shouldBe rowSet(Similarity.topKBruteForce(
      corpus.union(shard), q, "vec_id", "embedding", k = 3))
  }

  test("rebuildIvfPqStore: codes re-encode fresh from the supplied " +
      "corpus; post-swap serving == a one-shot build with the same " +
      "params, bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val corpus = (0 until 60).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("pq-gen").toString
    val idx = s"$dir/idx"; val ref = s"$dir/ref"
    Similarity.writeIvfPqStore(corpus, "vec_id", "embedding", idx,
      nCentroids = 4, m = 4, ksub = 8)
    Similarity.rebuildIvfPqStore(spark, idx, corpus, "vec_id",
      "embedding", nCentroids = 6, m = 4, ksub = 8, trainIters = 1)
    Similarity.writeIvfPqStore(corpus, "vec_id", "embedding", ref,
      nCentroids = 6, m = 4, ksub = 8, trainIters = 1)
    val q = corpus.where(col("vec_id") < 4)
    rowSet(Similarity.topKIvfPqStore(spark, idx, q, "vec_id",
      "embedding", k = 3, nProbe = 3)) shouldBe
      rowSet(Similarity.topKIvfPqStore(spark, ref, q, "vec_id",
        "embedding", k = 3, nProbe = 3))
  }

  test("ivfStoreSkewReport: counts sum to the corpus, ratios average " +
      "1, and the report reads the CURRENT generation") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val corpus = (0 until 50).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivf-skew").toString
    val idx = s"$dir/idx"
    Similarity.writeIvfStore(corpus, "vec_id", "embedding", idx,
      nCentroids = 5)
    val rep = Similarity.ivfStoreSkewReport(spark, idx).collect()
    rep.map(_.getLong(1)).sum shouldBe 50L
    (rep.map(_.getDouble(2)).sum / rep.length) shouldBe 1.0 +- 1e-9
    // after a rebuild the report follows the swap
    Similarity.rebuildIvfStore(spark, idx, nCentroids = 5, trainIters = 1)
    Similarity.ivfStoreSkewReport(spark, idx).collect()
      .map(_.getLong(1)).sum shouldBe 50L
  }

  test("two-level IVF assignment: near-total agreement with flat argmin " +
      "on clustered vectors, deterministic across runs") {
    import spark.implicits._
    // 8 well-separated clusters in 16 dims (one-hot axes ±0.1 noise)
    val rnd = new scala.util.Random(23)
    val corpus = (0 until 400).map { i =>
      val base = Array.fill(16)(0.0); base((i % 8) * 2) = 1.0
      (i.toLong, base.map(v => (v + rnd.nextGaussian() * 0.1).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.sampleCentroids(corpus, "vec_id", "embedding", 16)
      .localCheckpoint()
    val flat = Similarity.ivfAssign(corpus, cents, "vec_id", "embedding")
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val centArr = cents.collect().map { r =>
      (r.getLong(0), r.getSeq[Number](1).map(_.doubleValue()).toArray)
    }
    val mapping = Similarity.groupCentroids(centArr, 4)
    val two = Similarity.ivfAssignTwoLevel(corpus, cents, "vec_id",
      "embedding", mapping)
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the hierarchy only reroutes group-BOUNDARY vectors; on a clustered
    // corpus that is a thin shell — require >= 95% identical cells
    val agree = flat.count { case (id, cid) => two(id) == cid }
    agree.toDouble / flat.size should be >= 0.95
    // bit-determinism: a second evaluation is identical
    val again = Similarity.ivfAssignTwoLevel(corpus, cents, "vec_id",
      "embedding", mapping)
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    again shouldBe two
    // every assigned cell is a real centroid id
    two.values.toSet.subsetOf(centArr.map(_._1).toSet) shouldBe true
  }

  test("two-level IVF store: append ≡ rebuild (the persisted cid→gid " +
      "mapping freezes the hierarchy, so shard appends replay it)") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    def mk(ids: Range) = ids.map { i =>
      val base = Array.fill(16)(0.0); base((i % 8) * 2) = 1.0
      (i.toLong, base.map(v => (v + rnd.nextGaussian() * 0.1).toFloat))
    }.toDF("vec_id", "embedding")
    val base = mk(0 until 120)
    val shard = mk(120 until 160)
    val incDir = java.nio.file.Files.createTempDirectory("ivf2-inc").toString
    val fullDir = java.nio.file.Files.createTempDirectory("ivf2-full").toString
    Similarity.writeIvfStore(base, "vec_id", "embedding", s"$incDir/idx",
      nCentroids = 12, assignGroups = 3)
    Similarity.appendIvfStore(spark, s"$incDir/idx", shard, "vec_id",
      "embedding")
    val frozen = spark.read.parquet(s"$incDir/idx/centroids")
    Similarity.writeIvfStore(base.union(shard), "vec_id", "embedding",
      s"$fullDir/idx", centroidsOverride = Some(frozen), assignGroups = 3)
    rowSet(spark.read.parquet(s"$incDir/idx/assigned")) shouldBe
      rowSet(spark.read.parquet(s"$fullDir/idx/assigned"))
    // serving over the two-level store works unchanged
    val q = base.where(col("vec_id") < 3)
    val got = Similarity.topKIvfStore(spark, s"$incDir/idx", q,
      "vec_id", "embedding", k = 3, nProbe = 4)
    got.count() shouldBe 9L
  }
}
