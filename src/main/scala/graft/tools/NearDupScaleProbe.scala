package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash near-dup scaling probe at 1× / 10× / 100× (round-14 verdict
  * task 3): the 100 TB claim for the highest-traffic dedup family rested
  * on 10× probes; this pins TWO DECADES against the banded-LSH cost
  * model (~linear in rows at fixed band config — band keys are hashes,
  * so bucket occupancy per key is corpus-density-, not corpus-size-,
  * driven on a mostly-unique corpus).
  *
  * Corpus is GENERATED, not fixture bytes: deterministic pseudo-text
  * (40 tokens/doc, 50k-token vocab, token = f(seed, position)), with a
  * planted near-dup structure — every 50th document clones its
  * predecessor's text plus one extra token (Jaccard ≈ 38/43 ≈ 0.88 on
  * 3-shingles > 0.7 threshold), so TRUE pairs = n/50 exactly, linear by
  * construction, and candidate counts are checkable against it.
  *
  * Also records where the cost-adaptive block switch
  * (`spark.graft.neardup.blockSwitch`, default 1000 docs in the largest
  * lang×source block) flips between the blocked-pairwise and
  * prefix-filtered n-gram generators at these sizes.
  *
  * Run: {{{ sbt "runMain graft.tools.NearDupScaleProbe" }}}
  */
object NearDupScaleProbe {
  /** Deterministic synthetic corpus: doc i clones doc i-1 (+1 token)
    * when i % 50 == 0 (i > 0); otherwise 40 fresh pseudo-tokens. */
  def corpus(spark: SparkSession, n: Long): DataFrame = {
    val seed = when(col("id") % 50 === 0 && col("id") > 0,
      col("id") - 1).otherwise(col("id"))
    // xxhash64(seed, p) mixes properly: an affine token formula makes
    // every document an arithmetic progression over a 50k ring, where
    // near-coincident starts produce MASSIVE unintended shingle overlap
    // (first probe draft: 41 862 "near-dup" pairs vs 399 planted)
    val toks = (0 until 40).map { p =>
      concat(lit("w"), pmod(xxhash64(col("_seed"), lit(p)), lit(50000L)))
    }
    spark.range(n)
      .select(col("id").as("doc_id"), seed.as("_seed"),
        (col("id") % 4).cast("string").as("lang"),
        (col("id") % 8).cast("string").as("source"))
      .select(col("doc_id"), col("lang"), col("source"),
        when(col("doc_id") % 50 === 0 && col("doc_id") > 0,
          concat(concat_ws(" ", toks: _*), lit(" wextra")))
          .otherwise(concat_ws(" ", toks: _*)).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = 20000L
    // JIT/codegen warm-up, uncounted
    graft.text.Dedup.minhashLsh(corpus(spark, 2000L), "text", "doc_id")
      .write.format("noop").mode("overwrite").save()
    val results = Seq(1L, 10L, 100L).map { mult =>
      val n = base * mult
      val docs = corpus(spark, n)
      val t0 = System.nanoTime()
      val pairs = graft.text.Dedup.minhashLsh(docs, "text", "doc_id")
        .count()
      val wall = (System.nanoTime() - t0) / 1e9
      // candidate-pair count (the banding stage's output, pre-verify):
      // same band construction as minhashLsh, counted separately
      val withSig = docs.select(col("doc_id").as("id"),
        graft.functions.TextHashExprs
          .minhashText(lower(trim(col("text"))), 3, 32).as("sig"))
      val banded = withSig
        .select(col("id"),
          explode(graft.text.Dedup.lshBands(col("sig"), 32, 8)).as("b"))
        .select(col("id"), col("b.band"), col("b.bh"))
      val cands = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id")).distinct().count()
      // block-switch telemetry: largest lang×source block vs the 1000
      // crossover default
      val maxBlock = docs.groupBy("lang", "source").count()
        .agg(max("count")).collect()(0).getLong(0)
      println(f"[neardup-scale] n=$n%-8d wall=$wall%7.2fs " +
        f"pairs=$pairs%-7d cands=$cands%-7d true=${n / 50 - 1}%-7d " +
        f"maxBlock=$maxBlock (switch=${if (maxBlock > 1000) "prefix"
          else "blocked"})")
      (n, wall, pairs, cands)
    }
    val (n1, t1, _, c1) = results(0)
    val (n3, t3, _, c3) = results(2)
    val expT = math.log(t3 / t1) / math.log(n3.toDouble / n1)
    val expC = math.log(c3.toDouble / c1) / math.log(n3.toDouble / n1)
    println(f"[neardup-scale] fitted wall-time exponent over 2 decades:" +
      f" $expT%.3f (target <= ~1.2); candidate-count exponent: $expC%.3f")
    spark.stop()
  }
}
