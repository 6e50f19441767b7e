package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable document-quality classifier — the "fastText-style quality
  * scorer" stage of LLM curation pipelines (train a tiny linear model on
  * cheap per-doc features against a labeled slice, score the whole
  * corpus). Logistic-regression-shaped, built for the 100 TB regime AND
  * for engine-exact reproducibility:
  *
  *  - **Distributed batch gradient descent**: each iteration is ONE
  *    map-side projection (link + residual + per-feature terms) feeding a
  *    partial+final aggregation; only k gradient sums reach the driver,
  *    which updates the weight vector and embeds it as literals for the
  *    next round — the same shape as [[Similarity.kmeansCentroids]].
  *  - **Order-independent, engine-exact arithmetic**: gradient terms are
  *    quantized at 1e-6 and summed as LONGS — an exact integer sum is
  *    independent of partial-aggregation order AND converts to double
  *    identically in every engine (decimal sums are order-free too, but
  *    decimal→double conversion is correctly-rounded in the JVM and not
  *    necessarily elsewhere — last-ulp divergence would compound over
  *    iterations). The 1e-6 gradient quantization is part of the model
  *    definition, deterministic, and far below the gradient noise any
  *    batch GD step cares about. Training is therefore bit-reproducible
  *    and replayable by the DuckDB oracle as unrolled SQL.
  *  - **Rational link, not exp**: sigma(z) = 0.5 + z / (2 * (1 + |z|))
  *    (the "fast sigmoid"). Plain +,*,/,abs are IEEE-identical across
  *    engines while `exp` differs in last ulps — with exp the decimal
  *    cast could round differently on the two sides and diverge the
  *    whole training trajectory. Same monotone S-shape, range (0,1),
  *    sigma(0)=0.5; for a ranking/filter score the calibration
  *    difference is irrelevant.
  */
object Classifier {

  /** sigma(z) = 0.5 + z / (2(1+|z|)) — monotone, (0,1), IEEE-portable. */
  def fastSigmoid(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** Linear predictor w·x as a fixed-order left fold: bias first, then
    * featureCols in the given order (the oracle mirrors the order). */
  def predictor(weights: Array[Double], featureCols: Seq[String]): Column = {
    require(weights.length == featureCols.length + 1,
      s"${weights.length} weights for ${featureCols.length} features + bias")
    featureCols.zipWithIndex.foldLeft(lit(weights(0)): Column) {
      case (acc, (f, i)) => acc + lit(weights(i + 1)) * col(f).cast("double")
    }
  }

  /** Train logistic weights (bias +: features) with `iters` rounds of
    * full-batch gradient descent at rate `lr`, starting from zeros.
    * `labelCol` must be 0/1. Returns the weight vector; compose with
    * [[score]]. Deterministic on any partitioning (exact long sums).
    *
    * Executes `iters + 1` jobs over `df` (count + one aggregation per
    * round) — at corpus scale persist/checkpoint the feature frame first
    * so the feature projection isn't recomputed per round; the training
    * slice of a quality classifier is normally a bounded labeled sample
    * anyway, with [[score]] applied to the full corpus once. */
  def trainLogistic(df: DataFrame, featureCols: Seq[String],
      labelCol: String, iters: Int = 3, lr: Double = 0.1): Array[Double] = {
    val k = featureCols.length + 1
    var w = Array.fill(k)(0.0)
    val n = df.count().toDouble
    var it = 0
    while (it < iters) {
      val resid = fastSigmoid(predictor(w, featureCols)) -
        col(labelCol).cast("double")
      // gradient_j = sum_i x_ij * resid_i; bias has x_i0 = 1. Terms
      // round at 1e-6 into longs: the sum is exact, order-free, and
      // converts to double identically in any engine.
      val gradCols = (lit(1.0) +: featureCols.map(col(_).cast("double")))
        .zipWithIndex.map { case (x, j) =>
          sum(round(x * resid * lit(1000000.0), 0).cast("long")).as(s"g$j")
        }
      val row = df.agg(gradCols.head, gradCols.tail: _*).head()
      w = Array.tabulate(k) { j =>
        val g = row.getLong(j) / 1000000.0
        w(j) - lr * g / n
      }
      it += 1
    }
    w
  }

  /** Exact tie-aware Mann-Whitney AUC of a scored, labeled frame — model
    * evaluation as a pipeline operator (every trained gate needs its AUC
    * before it filters a corpus). AUC = (sum of positives' average ranks
    * - P(P+1)/2) / (P*N) under the ascending-score ordering, ties
    * receiving the average rank of their score group.
    *
    * Engine-exact by integer scaling: a tie group's average rank is a
    * half-integer, so 2*avgRank = first+last = 2*cumBefore + n + 1 is an
    * INTEGER — all sums run in longs and only the single final division
    * touches floating point (exact while P * sum(rank2) < 2^63, i.e.
    * eval sets to ~10^9 rows; model evaluation runs on labeled samples,
    * not the raw corpus). Scale shape: rows collapse to one row per
    * DISTINCT score (bounded for a quantized-predictor scorer), and the
    * rank window orders that bounded table only. Returns one row:
    * (n_pos, n_neg, auc rounded to 9). */
  def aucScore(scored: DataFrame, scoreCol: String,
      labelCol: String): DataFrame =
    aucScoreBy(scored, scoreCol, labelCol, Seq.empty)

  /** [[aucScore]] per group — per-source / per-domain gate quality in
    * one pass. The rank window partitions by group, so each group ranks
    * its own bounded distinct-score table independently (no global
    * funnel). Groups lacking both classes get a NULL auc (their counts
    * still report). */
  def aucScoreBy(scored: DataFrame, scoreCol: String, labelCol: String,
      groupCols: Seq[String]): DataFrame = {
    val gcols = groupCols.map(col)
    val g = scored.groupBy(gcols :+ col(scoreCol).as("_s"): _*)
      .agg(count(lit(1)).as("_n"),
        sum(col(labelCol).cast("long")).as("_p"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(col("_s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranked = g.withColumn("_cum",
        coalesce(sum(col("_n")).over(w), lit(0L)))
      .withColumn("_rank2",
        lit(2L) * col("_cum") + col("_n") + lit(1L))
    val agg = ranked.groupBy(gcols: _*).agg(
      sum(col("_p") * col("_rank2")).as("_sr2"),
      sum(col("_p")).as("n_pos"),
      sum(col("_n") - col("_p")).as("n_neg"))
    agg.select(gcols :+ col("n_pos") :+ col("n_neg") :+
      when(col("n_pos") > 0L && col("n_neg") > 0L,
        round((col("_sr2") - col("n_pos") * (col("n_pos") + lit(1L)))
            .cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 9)).as("auc"): _*)
  }

  /** Operating-point table for a scored, labeled frame: per threshold,
    * the exact confusion counts and precision/recall — how a trained
    * gate's cutoff is actually chosen. One pass: each row fans out to
    * |thresholds| (threshold, counts) contributions that combine
    * map-side; all counts are exact longs, the two ratios are single
    * divisions rounded to 9 (precision is NULL when nothing is
    * predicted positive — both engines agree on the NULL). */
  def prAtThresholds(scored: DataFrame, scoreCol: String,
      labelCol: String, thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "prAtThresholds needs thresholds")
    val y = col(labelCol).cast("long")
    val pred = col(scoreCol) >= col("threshold")
    scored.select(col(scoreCol), y.as("_y"),
        explode(array(thresholds.map(lit): _*)).as("threshold"))
      .groupBy(col("threshold"))
      .agg(sum(when(pred && col("_y") === 1L, 1L).otherwise(0L)).as("tp"),
        sum(when(pred && col("_y") === 0L, 1L).otherwise(0L)).as("fp"),
        sum(when(!pred && col("_y") === 1L, 1L).otherwise(0L)).as("fn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0L,
          round(col("tp").cast("double") / (col("tp") + col("fp")), 9))
          .as("precision"),
        when(col("tp") + col("fn") > 0L,
          round(col("tp").cast("double") / (col("tp") + col("fn")), 9))
          .as("recall"))
  }

  /** Reliability-diagram (calibration) bins: scores bucket into `nBins`
    * equal-width bins; per bin, exact counts, the 1e-6-long-quantized
    * mean score, and the empirical positive rate — the calibration
    * audit a trained gate ships with (a probability-calibrated gate
    * lets a pipeline pick thresholds by expected precision instead of
    * guesswork; mean_score far from frac_pos in a bin = miscalibrated).
    *
    * Engine-exactness: the bin index is floor(score·nBins) clamped to
    * the top bin (scores are already 9-decimal-rounded doubles, so both
    * engines floor the identical IEEE product); count/positive sums are
    * integers and the mean derives from a 1e-6 long-quantized sum — the
    * same order-free trick as the GD gradients.
    *
    * 100 TB shape: ONE partial+final aggregation collapsing the corpus
    * to nBins rows; map-side combine does the heavy lifting. */
  def calibrationBins(scored: DataFrame, scoreCol: String,
      labelCol: String, nBins: Int = 10): DataFrame = {
    require(nBins > 0, s"nBins must be positive: $nBins")
    val bin = least(floor(col(scoreCol) * nBins), lit(nBins - 1))
      .cast("long")
    scored.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("n_pos"),
        sum(round(col(scoreCol) * lit(1000000.0), 0).cast("long")).as("_sq"))
      .select(col("bin"), col("n"), col("n_pos"),
        round((col("_sq").cast("double") / lit(1000000.0)) /
          col("n").cast("double"), 6).as("mean_score"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("frac_pos"))
  }

  /** Score a corpus with trained weights: `score` in (0,1), rounded to 9
    * like the ANN cosine outputs (the value is already engine-exact —
    * the rounding just fixes the presentation). */
  def score(df: DataFrame, featureCols: Seq[String],
      weights: Array[Double]): DataFrame =
    df.withColumn("score",
      round(fastSigmoid(predictor(weights, featureCols)), 9))

  // --- hashing-trick sparse variant -----------------------------------

  /** Hashed bag-of-tokens features (the fastText/Vowpal hashing trick):
    * one row per (doc, bucket) with `x` = token count in that bucket,
    * bucket = unsigned FNV-1a(token) mod `dim`. Empty tokens are dropped
    * (matching the simhash tokenizer contract). `dim` bounds the feature
    * space — and with it the weight table — regardless of vocabulary
    * size, which is what makes the sparse trainer corpus-scale. */
  def hashedFeatures(docs: DataFrame, textCol: String, idCol: String,
      dim: Int): DataFrame =
    docs.select(col(idCol),
        explode(graft.functions.TextHashExprs.wsTokens(col(textCol))).as("_g"))
      .where(col("_g") =!= "")
      .select(col(idCol),
        graft.functions.TextHashExprs.fnvBucket(col("_g"), dim).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).cast("double").as("x"))

  /** Sparse logistic regression over hashed features — the variant where
    * the WEIGHTS THEMSELVES are distributed: the weight table is a
    * DataFrame keyed by bucket and is never collected to the driver, so
    * the feature dimension can be millions (the dense
    * [[trainLogistic]]'s driver-side `Array[Double]` caps out long
    * before that).
    *
    * Per iteration: the linear predictor is one hash join of the feature
    * rows against the weight table plus a doc-keyed aggregation; the
    * gradient is one bucket-keyed aggregation; the update is a
    * bucket-keyed left join (gradients cover every active bucket, so
    * absent prior weights coalesce to 0). `localCheckpoint` after each
    * round truncates the lineage — without it round t's plan replays
    * rounds 1..t-1.
    *
    * Engine-exactness mirrors [[trainLogistic]]: per-term predictor
    * contributions quantize at 1e-9, gradient terms at 1e-6, both into
    * LONGS (order-free integer sums), and the rational link keeps the
    * trajectory IEEE-portable — the oracle replays whole iterations as
    * unrolled SQL with the FNV bucket fold. Returns (bucket, w). */
  def trainLogisticHashed(feats: DataFrame, labels: DataFrame,
      idCol: String, labelCol: String, iters: Int = 2,
      lr: Double = 0.1): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val n = labels.count().toDouble
    require(n > 0, "trainLogisticHashed needs a non-empty label set")
    val f = feats.select(col(idCol).as("_id"), col("bucket"),
      col("x").cast("double").as("_x")).localCheckpoint(true)
    val y = labels.select(col(idCol).as("_id"),
      col(labelCol).cast("double").as("_y"))
    var weights = Seq.empty[(Long, Double)].toDF("bucket", "w")
    var it = 0
    while (it < iters) {
      val z = f.join(weights, Seq("bucket"), "left")
        .groupBy(col("_id"))
        .agg(sum(round(coalesce(col("w"), lit(0.0)) * col("_x") *
          lit(1000000000.0), 0).cast("long")).as("_zq"))
        .select(col("_id"),
          (col("_zq").cast("double") / lit(1000000000.0)).as("_z"))
      val sg = y.join(z, Seq("_id"), "left")
        .select(col("_id"), col("_y"),
          fastSigmoid(coalesce(col("_z"), lit(0.0))).as("_sg"))
      val grad = f.join(sg, Seq("_id"))
        .groupBy(col("bucket"))
        .agg(sum(round(col("_x") * (col("_sg") - col("_y")) *
          lit(1000000.0), 0).cast("long")).as("_g"))
      weights = grad.join(weights, Seq("bucket"), "left")
        .select(col("bucket"),
          (coalesce(col("w"), lit(0.0)) -
            lit(lr) * (col("_g").cast("double") / lit(1000000.0)) / lit(n))
            .as("w"))
        .localCheckpoint(true)
      it += 1
    }
    weights
  }

  /** Score every row of `docs` under a hashed-feature weight table:
    * adds `score` = rational-link sigma of the (quantized) linear
    * predictor, rounded to 9; docs with no feature rows score
    * sigma(0) = 0.5. One feature-side join + doc aggregation + one
    * broadcast-friendly join back — the corpus itself never shuffles. */
  def scoreHashed(docs: DataFrame, feats: DataFrame, weights: DataFrame,
      idCol: String): DataFrame = {
    val z = feats.select(col(idCol).as("_id"), col("bucket"),
        col("x").cast("double").as("_x"))
      .join(weights, Seq("bucket"), "left")
      .groupBy(col("_id"))
      .agg(sum(round(coalesce(col("w"), lit(0.0)) * col("_x") *
        lit(1000000000.0), 0).cast("long")).as("_zq"))
      .select(col("_id").as(idCol),
        (col("_zq").cast("double") / lit(1000000000.0)).as("_z"))
    docs.join(z, Seq(idCol), "left")
      .withColumn("score",
        round(fastSigmoid(coalesce(col("_z"), lit(0.0))), 9))
      .drop("_z")
  }
}
