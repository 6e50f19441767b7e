package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-memory cardinality sketches for corpus statistics at 100 TB.
  *
  * `approx_count_distinct` (Spark's HLL++) answers the same question but
  * its hash and register encoding are engine-private — no external system
  * can reproduce the estimate, which disqualifies it from this repo's
  * correctness gate and from any pipeline that must audit its numbers
  * across engines. This HLL is engine-portable by construction: FNV-1a
  * value hashing (the same byte fold the DuckDB oracles already replay
  * for the hashed classifier and simhash) and an exact-integer register
  * merge (see [[graft.functions.TextHashExprs.HllParts]] for the rank-cap
  * trick that makes the harmonic denominator a LONG sum).
  *
  * Scale shape: values map to (group, register) rows that combine
  * map-side under `max`, so the only shuffle carries at most
  * |groups| x 2^p tiny rows REGARDLESS of corpus size — counting
  * distinct tokens over 100 TB moves a few MB. An exact count(distinct)
  * instead shuffles every distinct value once (TBs for a web-scale
  * vocabulary) just to throw the list away.
  */
object Sketches {

  /** Approximate distinct `value` count per `groupCols` group via a
    * 2^p-register HyperLogLog (Flajolet et al. 2007, with the
    * linear-counting small-range correction; raw estimate otherwise).
    *
    * Returns one row per group: `n_values` (exact total, long),
    * `n_registers` (registers hit), `est_distinct` (the HLL estimate,
    * rounded to 6 — everything up to the one ln() in the small-range
    * branch is exact integer arithmetic, so cross-engine agreement is
    * guaranteed well past 6 decimals).
    *
    * p defaults to 11 (2048 registers, ~2.3% standard error) — the
    * largest precision whose worst-case harmonic denominator
    * (m-V)*2^51 + sum(2^(51-rank)) still fits a signed long. */
  def hllDistinct(df: DataFrame, value: Column, groupCols: Seq[String],
      p: Int = 11): DataFrame =
    hllEstimate(hllRegisters(df, value, groupCols, p), groupCols, p)

  /** The sketch's MERGEABLE form: one row per (group, register) with the
    * register's max rank and the exact value count. This is what a 100 TB
    * deployment materializes per shard/partition/day — register tables
    * union and re-max ([[hllMergeRegisters]]) without touching the data
    * again, and the SAME aggregation runs incrementally on a stream
    * (update-mode groupBy max — see `StreamingOps.distinctRegistersStream`).
    */
  def hllRegisters(df: DataFrame, value: Column, groupCols: Seq[String],
      p: Int = 11): DataFrame = {
    require(p >= 4 && p <= 11,
      s"p must be in [4,11] (long-exact denominator bound), got $p")
    val gcols = groupCols.map(col)
    // null values carry no cardinality information; without the guard a
    // null would materialize as a phantom null register in every group
    df.where(value.isNotNull)
      .select(gcols :+
        graft.functions.TextHashExprs.hllParts(value, p).as("_hp"): _*)
      .select(gcols :+ col("_hp.reg").as("reg") :+
        col("_hp.rank").as("rank"): _*)
      .groupBy(gcols :+ col("reg"): _*)
      .agg(max(col("rank")).as("max_rank"), count(lit(1)).as("n_values"))
  }

  /** Merge per-shard register tables (same p): union, re-max the ranks,
    * re-sum the value counts. max is associative/commutative/idempotent,
    * so shards may overlap in time or be replayed — the merged sketch
    * equals the one-pass sketch over the union BIT-EXACTLY (law-tested),
    * which is the property that lets 100 TB distinct counts come from
    * unioning a few KB per shard. */
  def hllMergeRegisters(shards: Seq[DataFrame],
      groupCols: Seq[String]): DataFrame = {
    require(shards.nonEmpty, "hllMergeRegisters needs at least one shard")
    val gcols = groupCols.map(col)
    shards.reduce(_.unionByName(_))
      .groupBy(gcols :+ col("reg"): _*)
      .agg(max(col("max_rank")).as("max_rank"),
        sum(col("n_values")).as("n_values"))
  }

  /** Collapse a register table ([[hllRegisters]] /
    * [[hllMergeRegisters]]) to per-group estimates. */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String],
      p: Int = 11): DataFrame = {
    require(p >= 4 && p <= 11,
      s"p must be in [4,11] (long-exact denominator bound), got $p")
    val m = 1L << p
    val numer = hllNumer(p)
    val gcols = groupCols.map(col)
    val agg = regs
      .groupBy(gcols: _*)
      .agg(sum(col("n_values")).as("n_values"),
        count(lit(1)).as("n_registers"),
        sum(call_function("shiftleft", lit(1L),
          lit(51) - col("max_rank"))).as("_s"))
    // denominator in 2^-51 units: empty registers contribute 2^0 each
    val denom = (lit(m) - col("n_registers")) * lit(1L << 51) + col("_s")
    val raw = lit(numer) / denom.cast("double")
    val v = col("n_registers").cast("double")
    // Flajolet's classic rule: linear counting while raw <= 2.5m. With
    // the fmix64-finalized hash both estimators sit within ~2-3% across
    // the crossover (measured n=300..100k at m=2048), so the published
    // rule needs no bias table. Both engines compute the same
    // deterministic estimate, so the branch decision is identical.
    val est = when(raw <= lit(2.5 * m) && col("n_registers") < lit(m),
        lit(m.toDouble) * log(lit(m.toDouble) / (lit(m.toDouble) - v)))
      .otherwise(raw)
    agg.select(gcols :+ col("n_values") :+ col("n_registers") :+
      round(est, 6).as("est_distinct"): _*)
  }

  /** The estimate numerator alpha_m * m^2 * 2^51 for precision p — every
    * multiplication is by an exact power of two except the alpha product,
    * so the value is a single-rounding double that an oracle embeds as a
    * literal and reproduces bit-exactly. */
  def hllNumer(p: Int): Double = {
    val m = 1L << p
    val alphaM = 0.7213 / (1.0 + 1.079 / m)
    alphaM * m * m * 9007199254740992.0 / 4.0 // * 2^51
  }

  /** [[hllDistinct]] over the whitespace tokens of `textCol` — the
    * vocabulary-size estimator for dataset cards. Tokenization matches
    * the repo-wide contract (lower, trim, split on `\s+`, drop empties;
    * the same stream the hashed classifier buckets). */
  def hllDistinctTokens(df: DataFrame, textCol: String,
      groupCols: Seq[String], p: Int = 11): DataFrame = {
    val gcols = groupCols.map(col)
    val toks = df.select(gcols :+
        explode(graft.functions.TextHashExprs.wsTokens(col(textCol))).as("_tok"): _*)
      .where(col("_tok") =!= "")
    hllDistinct(toks, col("_tok"), groupCols, p)
  }

  /** Join-cardinality planning WITHOUT running the join: HLL estimates
    * of the two sides' distinct key sets and — via the sketches'
    * mergeability + inclusion-exclusion — of their overlap. One row:
    * `est_left_keys`, `est_right_keys`, `est_union_keys`,
    * `est_common_keys` (= l + r − union, floored at 0). This is the
    * ~KB-state answer to "is this join selective? which side is
    * broadcastable after the semi-join?" that would otherwise cost two
    * full distinct aggregations and a shuffle join.
    *
    * Scale shape: each side collapses to ≤ 2^p register rows map-side;
    * the union sketch is a REGISTER merge (max per register), never a
    * second pass over the data. All estimate math inherits
    * [[hllEstimate]]'s exact-integer register arithmetic, so an external
    * oracle replays it bit-for-bit. Keys hash through their canonical
    * string form — engine-portable, and equal keys agree across sides
    * regardless of physical type width. */
  def hllKeyOverlap(left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column, p: Int = 11): DataFrame = {
    val l = left.select(leftKey.cast("string").as("k"))
      .withColumn("side", lit("left"))
    val r = right.select(rightKey.cast("string").as("k"))
      .withColumn("side", lit("right"))
    val regsL = hllRegisters(l, col("k"), Seq("side"), p)
    val regsR = hllRegisters(r, col("k"), Seq("side"), p)
    val regsU = hllMergeRegisters(Seq(
      regsL.withColumn("side", lit("union")),
      regsR.withColumn("side", lit("union"))), Seq("side"))
    val est = hllEstimate(
      regsL.unionByName(regsR).unionByName(regsU), Seq("side"), p)
    def pick(s: String) =
      max(when(col("side") === s, col("est_distinct")))
    est.agg(
        pick("left").as("est_left_keys"),
        pick("right").as("est_right_keys"),
        pick("union").as("est_union_keys"))
      .withColumn("est_common_keys",
        round(greatest(lit(0.0),
          col("est_left_keys") + col("est_right_keys")
            - col("est_union_keys")), 6))
  }

  /** Count-min sketch of a value stream: one row per (depth, bucket)
    * with the bucket's total occurrence count. d*w cells bound the state
    * regardless of vocabulary size — the fixed-memory complement to an
    * exact `groupBy(value).count()`, whose shuffle grows with the
    * vocabulary (Cormode & Muthukrishnan 2005).
    *
    * Scale shape: the d-bucket array is ONE native expression per value,
    * posexplode fans out d (not |vocab|) rows per value, and the count
    * aggregation combines map-side — the only shuffle carries at most
    * d*w cells per task. */
  def cmsSketch(df: DataFrame, value: Column, d: Int = 4,
      w: Int = 1024): DataFrame =
    df.select(posexplode(graft.functions.TextHashExprs
        .cmsBuckets(value, d, w)).as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-frequency estimates for `probes` from a [[cmsSketch]] of the
    * whitespace tokens of `textCol`: est = min over depths of the
    * probe's bucket count — an upper bound on the true count (never
    * under), within eps*N with the standard (d,w) guarantees. Returns
    * (token, est_count); ALL-INTEGER arithmetic, so the estimate is
    * engine-exact with no rounding contract at all. The probe side is a
    * handful of literals: its bucket rows broadcast-join the sketch.
    * Probes must already be in the token stream's normal form
    * (lowercase — the stream is lowered before hashing); an
    * un-normalized probe silently estimates the frequency of a token
    * that cannot occur. */
  def cmsFrequencyTokens(df: DataFrame, textCol: String,
      probes: Seq[String], d: Int = 4, w: Int = 1024): DataFrame = {
    require(probes.nonEmpty, "cmsFrequencyTokens needs at least one probe")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(
        explode(graft.functions.TextHashExprs.wsTokens(col(textCol))).as("_tok"))
      .where(col("_tok") =!= "")
    val sketch = cmsSketch(toks, col("_tok"), d, w)
    val probeBuckets = probes.toDF("token")
      .select(col("token"), posexplode(graft.functions.TextHashExprs
        .cmsBuckets(col("token"), d, w)).as(Seq("j", "bucket")))
    probeBuckets.join(sketch, Seq("j", "bucket"), "left")
      .groupBy(col("token"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }
}
