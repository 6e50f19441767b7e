package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus n-gram language-model scoring — the CCNet/KenLM-style
  * "perplexity filter" stage of web-corpus curation: train token-bigram
  * statistics over a (reference) corpus, then score every document by
  * its average negative log-likelihood under that model; documents far
  * from the reference distribution (gibberish, boilerplate, wrong
  * language) score high and get filtered or bucketed.
  *
  * 100 TB shape: training is one hash aggregation on the exploded bigram
  * stream (map-side partial counts; the LM table is Zipf-shaped — far
  * smaller than the corpus), plus a second aggregation for the
  * first-token marginals. Scoring is an explode + one shuffle hash join
  * against the LM keyed by the gram, then a per-doc aggregation —
  * `minCount` pruning keeps the LM table join-sized (the standard KenLM
  * pruning knob).
  *
  * Engine-exactness: each bigram's log-probability contribution is
  * quantized at 1e-9 into a LONG before the per-doc sum (exact integer
  * arithmetic — partial-agg order cannot flip a bit, and the JVM-vs-libm
  * `ln` last-ulp difference sits 7 orders of magnitude below the
  * quantum), and the final average rounds to 6. The DuckDB oracle
  * replays training AND scoring from the same corpus.
  */
object LanguageModel {

  private def toks(text: Column): Column = graft.functions.TextHashExprs.wsTokens(text)

  /** Non-distinct token bigrams of a text column ("w1 w2" strings) — a
    * single zip_with pass over two array slices, not the per-position
    * slice+concat_ws of [[TextAnalysis.tokenNgrams]] (the interpreted
    * per-element slices were the dominant cost of LM training at sf0.1;
    * same output, ~4× cheaper). */
  def bigrams(text: Column): Column = bigramsOf(toks(text))

  /** [[bigrams]] over a PRE-TOKENIZED array column — lets a caller
    * tokenizing once feed several gram widths from one materialized
    * pass (the backoff trainer's shape). */
  def bigramsOf(t: Column): Column =
    when(size(t) >= 2,
      zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))

  /** Train the bigram table: (gram, c12, c1, logp) with
    * logp = ln(c12 / c1), where c1 is the first-token occurrence count
    * as a bigram head. `minCount` drops rare grams BEFORE the marginal
    * is computed is wrong — marginals must count everything — so
    * pruning applies only to the emitted rows. */
  def trainBigramLm(docs: DataFrame, textCol: String,
      minCount: Long = 1L): DataFrame =
    trainBigramLmFromGrams(
      docs.select(explode(bigrams(col(textCol))).as("gram")), minCount)

  /** [[trainBigramLm]] from a PRE-EXPLODED gram stream (any frame with a
    * `gram` column, one row per bigram instance). The corpus explode is
    * the expensive pass — when one pipeline trains several LMs and then
    * scores against them (perplexity filter, DSIR), explode ONCE,
    * checkpoint, and feed every consumer from the same stream. */
  def trainBigramLmFromGrams(grams: DataFrame,
      minCount: Long = 1L): DataFrame = {
    val counts = grams.select(col("gram"))
      .groupBy("gram").agg(count(lit(1)).as("c12"))
    val marginals = counts
      .groupBy(substring_index(col("gram"), " ", 1).as("w1"))
      .agg(sum(col("c12")).as("c1"))
    // the LM table is the pipeline's materialization point: Zipf-bounded
    // (far smaller than the corpus), and every consumer — the scoring
    // join, often several scoring passes — would otherwise re-run the
    // corpus explode + two aggregations through lazy lineage. Eager
    // checkpoint, blocks freed by the ContextCleaner (same pattern as
    // the CC pair graph).
    counts
      .withColumn("w1", substring_index(col("gram"), " ", 1))
      .join(marginals, "w1")
      .where(col("c12") >= minCount)
      .select(col("gram"), col("c12"), col("c1"),
        log(col("c12").cast("double") / col("c1").cast("double")).as("logp"))
      .localCheckpoint(true)
  }

  /** Score each document: `n_bigrams` and `avg_nll` (average negative
    * log-likelihood, rounded to 6). Unseen bigrams contribute
    * `backoffLogp` (default ln 1e-9 — a flat out-of-vocabulary floor).
    * Documents with fewer than 2 tokens produce no row. */
  def scoreBigramLm(docs: DataFrame, lm: DataFrame, textCol: String,
      idCol: String,
      backoffLogp: Double = math.log(1e-9)): DataFrame =
    scoreBigramLmFromGrams(docs.select(col(idCol),
      explode(bigrams(col(textCol))).as("gram")), lm, idCol, backoffLogp)

  /** [[scoreBigramLm]] from a pre-exploded (idCol, gram) stream — see
    * [[trainBigramLmFromGrams]]. */
  def scoreBigramLmFromGrams(grams: DataFrame, lm: DataFrame,
      idCol: String,
      backoffLogp: Double = math.log(1e-9)): DataFrame = {
    val joined = grams.select(col(idCol), col("gram"))
      .join(lm.select(col("gram"), col("logp")), Seq("gram"), "left")
    val term = coalesce(col("logp"), lit(backoffLogp))
    joined
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(round(term * lit(1000000000.0), 0).cast("long")).as("_q"))
      .withColumn("avg_nll", round(
        -((col("_q").cast("double") / lit(1000000000.0)) /
          col("n_bigrams").cast("double")), 6))
      .drop("_q")
  }

  /** Map-side LM scoring — the SERVING shape: the (pruned, Zipf-sized)
    * LM is collected once and broadcast, and scoring becomes a pure
    * STATELESS projection: no explode, no join, no per-doc aggregation.
    * That is what makes it legal under Structured Streaming in append
    * mode (the join formulation's groupBy would need stateful machinery)
    * and cheaper in batch whenever the LM fits executor memory — the
    * common case after minCount pruning.
    *
    * Bit-identical to [[scoreBigramLm]]: identical tokenization
    * (UTF8String trim/lower + the same regex split), identical HALF_UP
    * 1e-9 quantization (java BigDecimal mirrors Spark's Round), and the
    * per-doc sum is exact integer arithmetic either way. Documents with
    * fewer than 2 tokens produce no row.
    *
    * The collect is GUARDED: an LM over `maxLmRows` grams (a minCount=1
    * model over a web corpus can exceed driver memory) never reaches the
    * driver — batch callers fall back to the bit-identical
    * [[scoreBigramLm]] join formulation automatically; streaming callers
    * (where the join's per-doc groupBy is not append-legal) get a typed
    * error telling them to prune the LM. The count is cheap: the LM is
    * already localCheckpointed by [[trainBigramLmFromGrams]]. */
  def scoreBigramLmBroadcast(docs: DataFrame, lm: DataFrame,
      textCol: String, idCol: String,
      backoffLogp: Double = math.log(1e-9),
      maxLmRows: Long = 4L << 20): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = docs.sparkSession
    val lmRows = lm.count()
    if (lmRows > maxLmRows) {
      if (docs.isStreaming)
        throw graft.OpenEoError("LmTooLargeToBroadcast",
          s"bigram LM has $lmRows rows > maxLmRows=$maxLmRows; the " +
            "streaming scorer must broadcast — raise minCount when " +
            "training (trainBigramLm) to prune the LM, or raise " +
            "maxLmRows if the executors have the memory")
      else
        return scoreBigramLm(docs, lm, textCol, idCol, backoffLogp)
    }
    val lmMap: Map[String, Double] = lm.select(col("gram"), col("logp"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val bc = spark.sparkContext.broadcast(lmMap)
    val backoffQ = quantHalfUp(backoffLogp * 1e9)
    val idIdx = docs.schema.fieldIndex(idCol)
    val txtIdx = docs.schema.fieldIndex(textCol)
    val outSchema = StructType(Seq(docs.schema.fields(idIdx),
      StructField("n_bigrams", LongType, nullable = false),
      StructField("avg_nll", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    docs.mapPartitions { rows =>
      val m = bc.value
      rows.flatMap { row =>
        val raw = row.getString(txtIdx)
        if (raw == null) Iterator.empty
        else {
          // exactly Spark's lower(trim(text)): UTF8String trim strips
          // only the space character (Java String.trim would also strip
          // control bytes — a real divergence on tab/newline edges)
          val toks = org.apache.spark.unsafe.types.UTF8String
            .fromString(raw).trim().toLowerCase.toString.split("\\s+", -1)
          if (toks.length < 2) Iterator.empty
          else {
            var q = 0L
            var i = 0
            while (i < toks.length - 1) {
              val g = toks(i) + " " + toks(i + 1)
              q += (m.get(g) match {
                case Some(lp) => quantHalfUp(lp * 1e9)
                case None => backoffQ
              })
              i += 1
            }
            val n = (toks.length - 1).toLong
            val nll = round6(-((q.toDouble / 1e9) / n.toDouble))
            Iterator.single(Row(row.get(idIdx), n, nll))
          }
        }
      }
    }(enc)
  }

  /** Spark `round(x, 0)` semantics (BigDecimal HALF_UP via valueOf) as a
    * long — `math.round` would differ on negative .5 boundaries. */
  private def quantHalfUp(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Spark `round(x, 6)` semantics. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** DSIR-style importance weight (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * the average log-ratio of a TARGET-domain n-gram LM to the BASE
    * (raw-corpus) LM — documents that look like the target distribution
    * score high and are up-sampled into the training mixture.
    *
    * `log_ratio = (1/n) Σ_bigrams (logp_target − logp_base)`, unseen
    * grams on either side backing off to `backoffLogp`. Feed the output
    * to [[Sampling.sampleFraction]]-style gating or rank-and-take.
    *
    * 100 TB shape: identical to [[scoreBigramLm]] — one corpus explode,
    * two hash joins against Zipf-sized LM tables (broadcast when the
    * target LM is small, as it usually is), one per-doc aggregation. The
    * per-gram log-ratio is quantized at 1e-9 into a LONG before the sum
    * (order-free integer arithmetic; ln ulp noise far below the
    * quantum). */
  def importanceWeights(docs: DataFrame, lmTarget: DataFrame,
      lmBase: DataFrame, textCol: String, idCol: String,
      backoffLogp: Double = math.log(1e-9)): DataFrame =
    importanceWeightsFromGrams(docs.select(col(idCol),
        explode(bigrams(col(textCol))).as("gram")),
      lmTarget, lmBase, idCol, backoffLogp)

  /** [[importanceWeights]] from a pre-exploded (idCol, gram) stream —
    * the DSIR pipeline shape: ONE corpus explode feeds the target LM
    * (filtered), the base LM, and this scorer. */
  def importanceWeightsFromGrams(grams: DataFrame, lmTarget: DataFrame,
      lmBase: DataFrame, idCol: String,
      backoffLogp: Double = math.log(1e-9)): DataFrame = {
    val joined = grams.select(col(idCol), col("gram"))
      .join(lmTarget.select(col("gram"), col("logp").as("_lt")),
        Seq("gram"), "left")
      .join(lmBase.select(col("gram"), col("logp").as("_lb")),
        Seq("gram"), "left")
    val term = coalesce(col("_lt"), lit(backoffLogp)) -
      coalesce(col("_lb"), lit(backoffLogp))
    joined
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(round(term * lit(1000000000.0), 0).cast("long")).as("_q"))
      .withColumn("log_ratio", round(
        (col("_q").cast("double") / lit(1000000000.0)) /
          col("n_bigrams").cast("double"), 6))
      .drop("_q")
  }

  /** Non-distinct token trigrams ("w1 w2 w3" strings) — two nested
    * zip_with passes over three array slices (same single-pass shape as
    * [[bigrams]]). */
  def trigrams(text: Column): Column = trigramsOf(toks(text))

  /** [[trigrams]] over a PRE-TOKENIZED array column (see
    * [[bigramsOf]]). */
  def trigramsOf(t: Column): Column = {
    val n = size(t)
    when(n >= 3,
      zip_with(
        zip_with(slice(t, lit(1), n - 2), slice(t, lit(2), n - 2),
          (a, b) => concat(a, lit(" "), b)),
        slice(t, lit(3), n - 2),
        (ab, c) => concat(ab, lit(" "), c)))
      .otherwise(array().cast("array<string>"))
  }

  /** Stupid-backoff trigram model (Brants et al. 2007, "Large Language
    * Models in Machine Translation"): three Zipf-bounded count tables +
    * the corpus token total. Each numerator row CARRIES its denominator
    * (c123 with c12, c23 with c2) so scoring needs no extra joins and
    * `minCount` pruning of emitted rows can never orphan a numerator
    * from its (unpruned) denominator. */
  final case class BackoffLm(tri: DataFrame, bi: DataFrame, uni: DataFrame,
      nTokens: Long)

  /** Train the three stupid-backoff tables in three hash aggregations
    * over ONE tokenized pass. The bigram table doubles as the trigram
    * denominator source (raw stream counts everywhere — stupid backoff's
    * defining simplification: scores are not normalized probabilities,
    * so no continuation-count bookkeeping).
    *
    * 100 TB shape: the explodes are the corpus-scale passes (map-side
    * partial counts collapse each to Zipf-sized tables before their one
    * exchange); the denominator attachments are table-vs-table joins on
    * the gram prefix, never corpus-scale. `nTokens` is the only driver
    * scalar. */
  def trainBackoffLm(docs: DataFrame, textCol: String,
      minCount: Long = 1L): BackoffLm = {
    // tokenize ONCE: the three count tables each explode the same
    // token stream — materializing the arrays spares two full
    // corpus tokenization (trim/lower/regex-split) passes
    val toksDf = docs.select(toks(col(textCol)).as("_t"))
      .localCheckpoint(true)
    val tokens = toksDf.select(explode(col("_t")).as("w"))
    val uniCnt = tokens.groupBy("w").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val nTokens = uniCnt.agg(sum(col("c"))).head().getLong(0)
    val biCnt = toksDf.select(explode(bigramsOf(col("_t"))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val triCnt = toksDf.select(explode(trigramsOf(col("_t"))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("c"))
    // attach denominators: trigram "w1 w2 w3" / bigram "w1 w2";
    // bigram "w2 w3" / unigram "w2"
    // prefix extraction via substring_index: one native byte scan per
    // row instead of 2-3 regex `split` evaluations (same value for
    // space-joined gram windows — tokens never contain the separator,
    // and empty edge tokens round-trip identically; r14, guide §4)
    // tri/bi/uni are each consumed by exactly ONE scoring join and
    // derive from the already-checkpointed uniCnt/biCnt/toksDf tables —
    // eager checkpoints here were three extra materialization jobs that
    // bought no reuse (r14; the fan-out rule applies to toksDf and the
    // count tables, which ARE reused)
    val tri = triCnt
      .withColumn("_p", substring_index(col("gram"), " ", 2))
      .join(biCnt.select(col("gram").as("_p"), col("c").as("cden")), "_p")
      .where(col("c") >= minCount)
      .select(col("gram"), col("c").as("c123"), col("cden").as("c12"))
    val bi = biCnt
      .withColumn("_w1", substring_index(col("gram"), " ", 1))
      .join(uniCnt.select(col("w").as("_w1"), col("c").as("cden")), "_w1")
      .where(col("c") >= minCount)
      .select(col("gram"), col("c").as("c23"), col("cden").as("c2"))
    val uni = uniCnt.where(col("c") >= minCount)
      .select(col("w"), col("c").as("c3"))
    BackoffLm(tri, bi, uni, nTokens)
  }

  /** Score each document by average negative log stupid-backoff score
    * over its trigram positions:
    *
    *   S(w3|w1 w2) = c123/c12            if the trigram is in the model
    *               = α · c23/c2          else if the bigram (w2 w3) is
    *               = α² · c3/N           else if the unigram w3 is
    *               = α² · 1/N            else (OOV pseudo-count 1)
    *
    * Documents with fewer than 3 tokens produce no row. Three left hash
    * joins of the exploded trigram stream against the Zipf-sized tables
    * (the scale shape of [[scoreBigramLm]], ×3), per-term 1e-9 long
    * quantization, one per-doc aggregation. */
  def scoreBackoffLm(docs: DataFrame, lm: BackoffLm, textCol: String,
      idCol: String, alpha: Double = 0.4): DataFrame = {
    val lnA = math.log(alpha)
    val stream = docs.select(col(idCol),
      explode(trigrams(col(textCol))).as("g3"))
    // suffix keys via substring_index byte scans (was 3 regex `split`
    // evaluations per trigram row — r14, guide §4): "w2 w3" is the
    // suffix after the first separator, w3 the suffix after the last
    val keyed = stream
      .withColumn("g2", substring_index(col("g3"), " ", -2))
      .withColumn("w", substring_index(col("g3"), " ", -1))
    val joined = keyed
      .join(lm.tri.select(col("gram").as("g3"), col("c123"), col("c12")),
        Seq("g3"), "left")
      .join(lm.bi.select(col("gram").as("g2"), col("c23"), col("c2")),
        Seq("g2"), "left")
      .join(lm.uni.select(col("w"), col("c3")), Seq("w"), "left")
    val n = lit(lm.nTokens.toDouble)
    val term =
      when(col("c123").isNotNull,
        log(col("c123").cast("double") / col("c12").cast("double")))
      .when(col("c23").isNotNull,
        lit(lnA) + log(col("c23").cast("double") / col("c2").cast("double")))
      .when(col("c3").isNotNull,
        lit(2 * lnA) + log(col("c3").cast("double") / n))
      .otherwise(lit(2 * lnA) + log(lit(1.0) / n))
    joined
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(round(term * lit(1000000000.0), 0).cast("long")).as("_q"))
      .withColumn("avg_nll", round(
        -((col("_q").cast("double") / lit(1000000000.0)) /
          col("n_trigrams").cast("double")), 6))
      .drop("_q")
  }
}
