package graft

import graft.text.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("gramMatrix equals the brute-force quantized second moment and is " +
      "partition-invariant") {
    val rnd = new scala.util.Random(11)
    val dim = 5
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    def qround(x: Double): Long =
      if (x >= 0) math.round(x) else -math.round(-x)
    val want = (for (i <- 0 until dim; j <- i until dim) yield ((i, j),
      vecs.map { case (_, v) =>
        qround(v(i).toDouble * v(j).toDouble * 1e6)
      }.sum)).toMap
    val got = Pca.gramMatrix(df, "embedding", dim)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    got shouldBe want
    val again = Pca.gramMatrix(df.repartition(7), "embedding", dim)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    again shouldBe want
  }

  test("powerEigen recovers a known spectrum with deflation") {
    // diag(9, 4, 1): eigenpairs are the axes in decreasing order
    val a = Array(
      Array(9.0, 0.0, 0.0),
      Array(0.0, 4.0, 0.0),
      Array(0.0, 0.0, 1.0))
    val eig = Pca.powerEigen(a, k = 3, iters = 60)
    eig(0)._1 shouldBe (9.0 +- 1e-9)
    eig(1)._1 shouldBe (4.0 +- 1e-9)
    eig(2)._1 shouldBe (1.0 +- 1e-9)
    math.abs(eig(0)._2(0)) shouldBe (1.0 +- 1e-6)
    math.abs(eig(1)._2(1)) shouldBe (1.0 +- 1e-6)
  }

  test("powerEigen: eigen residual |Av - λv| small, components " +
      "orthogonal, on a random symmetric matrix") {
    val rnd = new scala.util.Random(3)
    val dim = 8
    val m = Array.tabulate(dim, dim)((_, _) => rnd.nextDouble() - 0.5)
    // a = m mᵀ: symmetric PSD with a generic spectrum
    val a = Array.tabulate(dim, dim)((i, j) =>
      (0 until dim).map(k => m(i)(k) * m(j)(k)).sum)
    val eig = Pca.powerEigen(a, k = 2, iters = 200)
    for ((lam, v) <- eig) {
      val av = Array.tabulate(dim)(i =>
        (0 until dim).map(j => a(i)(j) * v(j)).sum)
      val resid = math.sqrt((0 until dim)
        .map(i => math.pow(av(i) - lam * v(i), 2)).sum)
      resid should be < 1e-6
    }
    val dot01 = (0 until dim).map(i => eig(0)._2(i) * eig(1)._2(i)).sum
    math.abs(dot01) should be < 1e-6
    eig(0)._1 should be >= eig(1)._1
  }

  test("pcaProject: projection matches the manual dot products, " +
      "deterministic under repartitioning") {
    val rnd = new scala.util.Random(5)
    val dim = 6
    val vecs = (0L until 30L).map(i =>
      (i, Array.fill(dim)(rnd.nextFloat())))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Pca.pcaProject(df, "vec_id", "embedding", dim, k = 2,
        iters = 12)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // recompute the expected projection through the same public pieces
    val gram = Pca.collectGram(Pca.gramMatrix(df, "embedding", dim), dim)
    val comps = Pca.powerEigen(gram, 2, 12).map(_._2)
    for ((id, v) <- vecs; c <- 0 until 2) {
      var s = 0.0; var j = 0
      while (j < dim) { s += v(j).toDouble * comps(c)(j); j += 1 }
      out(id)(c) shouldBe (s +- 1e-12)
    }
    val again = Pca.pcaProject(df.repartition(5), "vec_id", "embedding",
        dim, k = 2, iters = 12)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    again shouldBe out
  }

  test("pcaWhitenProject: unit second moment per component, = project/√λ") {
    val rnd = new scala.util.Random(9)
    val dim = 6
    val df = (0L until 40L).map(i =>
      (i, Array.fill(dim)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val gram = Pca.collectGram(Pca.gramMatrix(df, "embedding", dim), dim)
    val eig = Pca.powerEigen(gram, 2, 40)
    val plain = Pca.pcaProject(df, "vec_id", "embedding", dim, 2, 40)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val white = Pca.pcaWhitenProject(df, "vec_id", "embedding", dim, 2, 40)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // definitional identity: whitened = plain / sqrt(lambda)
    for ((id, ws) <- white; c <- 0 until 2)
      ws(c) shouldBe (plain(id)(c) / math.sqrt(eig(c)._1) +- 1e-12)
    // whitening law: Σ_rows score² = wᵀ X'X w / λ ≈ 1 for a converged
    // eigenvector (Gram is uncentered and unnormalized, so the second
    // moment over the CORPUS, not per row, is what normalizes to 1)
    for (c <- 0 until 2) {
      val ss = white.values.map(v => v(c) * v(c)).sum
      ss shouldBe (1.0 +- 1e-3)
    }
  }
}
