package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Both samplers key off a PORTABLE integer hash (a linear-congruential
  * mix in plain modular arithmetic) instead of `rand()` or engine hash
  * functions: the sample is reproducible across runs, partitionings, and
  * engines (the DuckDB oracle computes the identical arithmetic), which is
  * what a dataset card needs — "we kept ids with lcg(id) < f·M" is a
  * statement anyone can re-verify at 100 TB.
  */
object Sampling {

  // Knuth/glibc LCG constants; M = 2^31 keeps every intermediate below
  // 2^62 (no ANSI overflow for any bigint id)
  private val A = 1103515245L
  private val C = 12345L
  private val M = 2147483648L

  /** The portable per-id hash in [0, M): ((id mod M) * A + C) mod M. */
  def portableHash(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(M)) * lit(A) + lit(C), lit(M))

  /** Deterministic Bernoulli sample: keep rows with hash < fraction·M.
    * A pure filter — no shuffle, fully pushdown-friendly, stable under
    * repartitioning (rand()-based sampling is none of these). */
  def sampleFraction(df: DataFrame, idCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction not in [0,1]")
    df.where(portableHash(col(idCol)) < lit((fraction * M).toLong))
  }

  /** Deterministic WEIGHTED Bernoulli sample — the resampling half of
    * importance-weighted selection (DSIR, Xie et al. 2023): keep each row
    * with probability min(1, weight), decided by the portable id hash
    * (hash(id) < w·M). Like [[sampleFraction]] it is a PURE FILTER — no
    * shuffle, stable under repartitioning, and the kept sets are NESTED
    * as weights grow (hash(id) is fixed, only the threshold moves).
    * For engine-exact replays pass a 1e-6-quantized weight (e.g.
    * `round(exp(log_ratio), 6)`): both engines then multiply identical
    * doubles against the same integer hash. */
  def sampleByWeight(df: DataFrame, idCol: String, weight: Column): DataFrame =
    df.where(portableHash(col(idCol)) <
      least(weight, lit(1.0)).cast("double") * lit(M.toDouble))

  /** Exact-k WEIGHTED sample without replacement (Efraimidis-Spirakis
    * 2006): each row draws `key = ln(u) / w` with `u ∈ (0,1)` derived
    * from the portable id hash, and the k LARGEST keys win — equivalent
    * to maximizing u^(1/w), so inclusion probability scales with weight,
    * no row repeats, and the whole draw is a deterministic function of
    * (id, weight) any engine reproduces. Plans as TakeOrderedAndProject
    * (bounded per-partition heaps, never a global sort). Ties break to
    * the lowest id. Pass 1e-6-quantized weights for engine-exact
    * replays, as with [[sampleByWeight]]. */
  def sampleWeightedK(df: DataFrame, idCol: String, weight: Column,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val u = (portableHash(col(idCol)) + lit(1L)).cast("double") /
      lit((M + 1).toDouble)
    df.withColumn("_es_key", log(u) / weight)
      .orderBy(col("_es_key").desc, col(idCol))
      .limit(k)
      .drop("_es_key")
  }

  /** Leakage-safe dataset split: every row of a GROUP (same `groupCol`
    * value — a URL domain, a near-dup cluster id, an author) lands in the
    * same split, so correlated documents cannot straddle train/validation.
    * The split comes from the portable hash of the group key mapped onto
    * cumulative weight buckets — deterministic, engine-reproducible, and
    * a pure projection (no shuffle; the group key is hashed in place).
    *
    * `weights` are (name, weight) pairs; buckets partition [0, M) in the
    * given order by weight/total. */
  def assignSplit(df: DataFrame, groupCol: String,
      weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"split weights must be positive: $weights")
    val total = weights.map(_._2).sum
    // group key → [0, 2^32) via the first 8 hex chars of md5: md5 is
    // byte-identical everywhere (unlike xxhash64), so an external engine
    // reproduces the exact assignment
    val H = 4294967296L // 2^32
    val bounds = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }
      .map(c => (c / total * H).toLong)
    val h = conv(substring(md5(col(groupCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val expr = weights.zipWithIndex.foldRight(
      lit(weights.last._1): org.apache.spark.sql.Column) {
      case (((name, _), i), acc) =>
        when(h < bounds(i + 1), lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Exact-n-per-stratum sample: the n ids with the smallest portable
    * hash in each stratum (ties break by ascending id).
    *
    * Scale shape: the bounded [[graft.functions.TopKAgg]] runs under
    * groupBy(strata) with map-side combine — each task reduces to ≤ n ids
    * per stratum before the only shuffle, so the full rows never move;
    * the selected (stratum, id) set (n × |strata| rows) broadcast
    * semi-joins the originals. A window row_number would instead shuffle
    * every row into per-stratum partitions. */
  def sampleStratified(df: DataFrame, strataCols: Seq[String], idCol: String,
      nPerStratum: Int): DataFrame = {
    require(nPerStratum > 0, s"nPerStratum must be positive: $nPerStratum")
    // TopKAgg keeps the LARGEST score (desc, ties id asc); negating the
    // hash selects the smallest hashes with the same id tie-break
    val score = -portableHash(col(idCol)).cast("double")
    val picked = df
      .groupBy(strataCols.map(col): _*)
      .agg(graft.functions.TopKAgg.topK(nPerStratum)(
        col(idCol), score).as("_nn"))
      .select(strataCols.map(col) :+
        explode(col("_nn.id")).as(idCol): _*)
    df.join(broadcast(picked), strataCols :+ idCol, "left_semi")
  }

  /** Deterministic global shuffle — the training-order step: rows rank
    * by portable LCG hash (ties by id), giving every engine and every
    * run the identical pseudorandom order without an RNG. At cluster
    * scale `orderBy` plans a range-partitioned sort (sampled bounds, no
    * single-partition funnel); downstream pack/batch steps consume the
    * order directly. `ord` is a dense 0-based position — materialize it
    * only when the consumer needs explicit positions, and at scale use
    * [[shuffleDeterministicOrdinals]] (per-partition offsets, stays
    * distributed); this window form funnels through ONE partition and
    * is kept for small frames and as the semantic reference. */
  def shuffleDeterministic(df: DataFrame, idCol: String,
      withOrdinal: Boolean = false): DataFrame =
    if (!withOrdinal) df.orderBy(portableHash(col(idCol)), col(idCol))
    else
      // the ranking window imposes the global order itself (and funnels
      // into one partition); a pre-orderBy would be a second full sort
      // whose ordering the window exchange then discards
      df.withColumn("ord", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(portableHash(col(idCol)), col(idCol))).cast("long") - 1)

  /** [[shuffleDeterministic]] with the ordinal materialized AT SCALE: the
    * range-partitioned sort stays distributed and dense 0-based positions
    * come from per-partition offsets (zipWithIndex), not a one-partition
    * ranking window. Identical output to the window formulation (same
    * total (hash, id) order → same ordinals, regardless of where the
    * range sampler places partition boundaries; pinned in LawsSpec).
    *
    * Cost trade documented at the caveat site this closes: one extra
    * count job (zipWithIndex's offset pass) and one serialization
    * boundary out of Tungsten for the zip itself. Prefer the plain
    * sorted frame when the consumer doesn't need explicit positions. */
  def shuffleDeterministicOrdinals(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(portableHash(col(idCol)), col(idCol))
    val withOrd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(withOrd, sorted.schema.add(
      org.apache.spark.sql.types.StructField("ord",
        org.apache.spark.sql.types.LongType, nullable = false)))
  }

  /** Deterministic weighted mixture of sources — the dataset-mixing step
    * of a training pipeline ("70% web, 30% code"): each source thins by
    * its rate via the portable-hash Bernoulli filter (so the mix is
    * reproducible row-for-row on any engine), a `mix_source` tag records
    * provenance, and the union interleaves in deterministic pseudorandom
    * order via the same hash. Rates are KEEP probabilities per source —
    * callers derive them from target token ratios upstream.
    *
    * Scale shape: thinning is a pushdown-friendly filter per source,
    * the union is metadata-only, and the interleave order materializes
    * only where a consumer sorts ([[shuffleDeterministic]] semantics
    * apply). */
  def interleaveSources(sources: Seq[(DataFrame, Double, String)],
      idCol: String): DataFrame = {
    require(sources.nonEmpty, "interleaveSources needs at least one source")
    val tagged = sources.map { case (df, rate, tag) =>
      sampleFraction(df, idCol, rate)
        .withColumn("mix_source", lit(tag))
    }
    tagged.reduce(_ unionByName _)
  }

  /** Per-group cap — the corpus-balancing step (cap each domain /
    * source / language at `k` documents so one crawl host cannot dominate
    * the mixture): keep the `k` highest-`scoreCol` rows per group, ties
    * broken by ascending id so the cut is deterministic under any
    * partitioning.
    *
    * 100 TB shape: the bounded [[graft.functions.TopKAgg]] pre-prune
    * (promoted from an r4 comment to code) computes each group's
    * surviving id set with MAP-SIDE partials — every task reduces its
    * slice to ≤ k candidates per group before the only full-width
    * shuffle, so a pathologically hot group (one domain with billions
    * of rows) costs nPartitions × k tiny (id, score) rows instead of a
    * billion-row single-partition sort. The row_number window then
    * ranks only the ≤ |groups|·k semi-join survivors, and its result
    * is bit-identical to the unpruned formulation: TopKAgg's
    * comparator IS the window's ORDER BY (score desc, ties id asc,
    * Double.compare NaN semantics), so the pruned set contains exactly
    * the rows the window would keep (duplicate ids re-rank identically
    * among themselves). The broadcast of the picked set follows
    * [[sampleStratified]]; for |groups|·k beyond broadcast range drop
    * the hint and the semi-join shuffles narrow (group, id) rows only.
    *
    * `idCol` must be integral (it rides TopKAgg's long lane) and
    * `scoreCol` numeric — the same contract as the ANN path. */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], scoreCol: Column,
      idCol: String, k: Int): DataFrame = {
    require(groupCols.nonEmpty, "capPerGroup needs at least one group col")
    val picked = df
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.TopKAgg.topK(k)(
        col(idCol), scoreCol.cast("double")).as("_nn"))
      .select(groupCols.map(col) :+ explode(col("_nn.id")).as(idCol): _*)
    val pruned = df.join(broadcast(picked), groupCols :+ idCol, "left_semi")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(scoreCol.desc, col(idCol))
    pruned.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k)
      .drop("_rn")
  }

  /** Temperature-based source mixing (the mT5/XLM-R alpha-sampling rule):
    * source s with n_s documents is kept at rate
    * p_s = min(1, target * (n_s^alpha / sum_t n_t^alpha) / n_s), so
    * alpha = 1 preserves natural proportions, alpha -> 0 flattens toward
    * uniform-per-source, and intermediate alpha up-samples the tail
    * without starving the head — then rows keep deterministically via the
    * portable LCG hash (same comparison as [[sampleFraction]]).
    *
    * 100 TB shape: the per-source count aggregation reduces to
    * |sources| rows (map-side combine; sources are domains/datasets —
    * thousands at most), rates become literals in a when-chain, and the
    * sample itself is a PURE FILTER: no shuffle, pushdown-friendly,
    * repartition-stable. Engine-exactness: the per-source keep threshold
    * floor(p_s * 2^31) is integer on both sides; n^alpha and the
    * name-ordered normalizing sum are IEEE double ops whose <=2-ulp
    * engine noise sits ~9 orders below a threshold unit, so the floor
    * agrees across engines except on exact-boundary measure-zero cases.
    *
    * `target` is the expected TOTAL kept-document count. Sources whose
    * p_s clips at 1 keep everything (the remaining mass is NOT
    * redistributed — matching the published formulation, where rates are
    * computed once from the weight vector, not iterated). */
  def temperatureSample(df: DataFrame, sourceCol: String, idCol: String,
      alpha: Double, target: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha not in (0,1]")
    require(target > 0, s"target $target must be positive")
    // bounded driver-side collect: one row per source (the weight vector
    // of the published rule is itself per-source, so this is inherent).
    // Null sources get no rate and therefore never pass the keep filter
    // (the when-chain falls through to threshold 0) — skip them here or
    // the weight normalization would count mass no row can ever claim.
    val counts = df.groupBy(col(sourceCol)).count()
      .collect()
      .filter(!_.isNullAt(0))
      .map(r => (r.get(0).toString, r.getLong(1)))
      .sortBy(_._1)
    val weights = counts.map { case (g, n) => (g, math.pow(n.toDouble, alpha), n) }
    // left-to-right fold in source-name order; the oracle mirrors it as
    // an ordered SUM so the last-ulp rounding trajectory is identical
    val norm = weights.foldLeft(0.0) { case (acc, (_, w, _)) => acc + w }
    val thresholds = weights.map { case (g, w, n) =>
      val p = math.min(1.0, target.toDouble * (w / norm) / n.toDouble)
      (g, (p * 2147483648.0).toLong) // floor (p >= 0)
    }
    val thrCol = thresholds.foldRight(lit(0L): Column) {
      case ((g, t), acc) => when(col(sourceCol) === lit(g), lit(t)).otherwise(acc)
    }
    df.where(portableHash(col(idCol)) < thrCol)
  }

  /** UniMax budget allocation (Chung et al. 2023): spend a total
    * document budget over sources by WATER-FILLING — every source gets
    * an equal share of the remaining budget unless its whole corpus is
    * smaller than that share, in which case it is kept in full and the
    * leftover redistributes over the larger sources. Unlike temperature
    * mixing there is no free α: small sources are never starved and the
    * head never repeats, which is the published argument for UniMax
    * over α-sampling at large budgets (1-epoch cap formulation — the
    * batch sampler expresses no up-sampling).
    *
    * Determinism/engine-exactness: the full-vs-partial cutoff uses the
    * INTEGER test `n·(k−i) ≤ remaining` over sources sorted ascending
    * by (count, name) — a prefix property (proved in the water-filling
    * literature: once one source is partial every larger one is too),
    * so allocations are `n` for the prefix and one shared IEEE-double
    * share for the suffix. Rows keep via the portable LCG threshold
    * floor(share/n · 2³¹), the same filter contract as
    * [[temperatureSample]] (and the same measure-zero boundary caveat).
    *
    * 100 TB shape: identical to [[temperatureSample]] — one |sources|-row
    * count aggregation to the driver, rates become literals in a
    * when-chain, and the sample itself is a PURE FILTER (no shuffle,
    * pushdown-friendly, repartition-stable). Null sources never match
    * the chain and are dropped. */
  def unimaxSample(df: DataFrame, sourceCol: String, idCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    val counts = df.groupBy(col(sourceCol)).count()
      .collect()
      .filter(!_.isNullAt(0))
      .map(r => (r.get(0).toString, r.getLong(1)))
      .sortBy { case (g, n) => (n, g) }
    require(counts.nonEmpty, "unimaxSample needs at least one non-null source")
    val k = counts.length
    var remaining = budget
    var cut = 0
    while (cut < k && counts(cut)._2 * (k - cut) <= remaining) {
      remaining -= counts(cut)._2
      cut += 1
    }
    // every suffix source gets the SAME share (see prefix property)
    val sStar = if (cut < k) remaining.toDouble / (k - cut) else 0.0
    val thresholds = counts.zipWithIndex.map { case ((g, n), i) =>
      val thr =
        if (i < cut) 2147483648L // p = 1: keep the whole source
        else (math.min(1.0, sStar / n.toDouble) * 2147483648.0).toLong
      (g, thr)
    }
    val thrCol = thresholds.foldRight(lit(0L): Column) {
      case ((g, t), acc) =>
        when(col(sourceCol) === lit(g), lit(t)).otherwise(acc)
    }
    df.where(portableHash(col(idCol)) < thrCol)
  }

  /** [[unimaxSample]] with an EPOCH cap — the data-constrained regime
    * (UniMax as published, Chung et al. 2023 §3; cf. Muennighoff et al.
    * 2023 on repeating data): a source may be seen up to `maxEpochs`
    * times, so its capacity is n·E rows and small sources UP-SAMPLE
    * (repeat) toward their equal share instead of merely being kept
    * whole. Water-filling runs over capacities (ascending (n·E, name),
    * same integer prefix test); a full source emits all E epochs, a
    * partial one emits floor(epochs) whole copies plus a deterministic
    * LCG-thresholded fraction of an extra copy. Output rows carry an
    * `epoch` column (1-based copy index) — training-order shuffling
    * downstream spreads the copies.
    *
    * 100 TB shape: per-source copy counts and thresholds are literals
    * (one bounded count aggregation); the up-sampling itself is a
    * map-side `explode(sequence(...))` — row multiplication with NO
    * shuffle, pushdown-friendly below, repartition-stable. */
  def unimaxSampleEpochs(df: DataFrame, sourceCol: String, idCol: String,
      budget: Long, maxEpochs: Long): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    require(maxEpochs >= 1, s"maxEpochs $maxEpochs must be >= 1")
    val counts = df.groupBy(col(sourceCol)).count()
      .collect()
      .filter(!_.isNullAt(0))
      .map(r => (r.get(0).toString, r.getLong(1)))
      .sortBy { case (g, n) => (n * maxEpochs, g) }
    require(counts.nonEmpty,
      "unimaxSampleEpochs needs at least one non-null source")
    val k = counts.length
    var remaining = budget
    var cut = 0
    while (cut < k && counts(cut)._2 * maxEpochs * (k - cut) <= remaining) {
      remaining -= counts(cut)._2 * maxEpochs
      cut += 1
    }
    val sStar = if (cut < k) remaining.toDouble / (k - cut) else 0.0
    // per source: whole copies + LCG threshold for the fractional copy
    val alloc = counts.zipWithIndex.map { case ((g, n), i) =>
      if (i < cut) (g, maxEpochs, 0L) // full: E copies, no fraction
      else {
        val epochs = sStar / n.toDouble
        val whole = math.floor(epochs).toLong
        val thr = ((epochs - whole) * 2147483648.0).toLong
        (g, whole, thr)
      }
    }
    val wholeCol = alloc.foldRight(lit(0L): Column) { case ((g, w, _), acc) =>
      when(col(sourceCol) === lit(g), lit(w)).otherwise(acc)
    }
    val thrCol = alloc.foldRight(lit(0L): Column) { case ((g, _, t), acc) =>
      when(col(sourceCol) === lit(g), lit(t)).otherwise(acc)
    }
    val copies = wholeCol +
      when(portableHash(col(idCol)) < thrCol, 1L).otherwise(0L)
    df.withColumn("_copies", copies)
      .where(col("_copies") > 0L)
      .select(df.columns.map(col) :+
        explode(sequence(lit(1L), col("_copies"))).as("epoch"): _*)
  }

  /** Split-leakage audit: given a near-dup pair list and a split
    * assignment, count the pairs whose two sides landed in DIFFERENT
    * splits — the number a leakage-safe split must drive to zero
    * (correlated documents straddling train/eval inflate benchmark
    * scores). Returns one row: (n_pairs, n_cross).
    *
    * Scale shape: two broadcast-friendly joins of the (small, verified)
    * pair list against the (id, split) projection — the corpus never
    * shuffles; split tables at corpus scale are a pure projection of the
    * hash rules anyway ([[assignSplit]]). */
  def splitLeakage(pairs: DataFrame, aCol: String, bCol: String,
      splits: DataFrame, idCol: String, splitCol: String): DataFrame = {
    val sa = splits.select(col(idCol).as(aCol), col(splitCol).as("_sa"))
    val sb = splits.select(col(idCol).as(bCol), col(splitCol).as("_sb"))
    pairs.select(aCol, bCol)
      .join(sa, aCol).join(sb, bCol)
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("_sa") =!= col("_sb"), 1L).otherwise(0L))
          .as("n_cross"))
  }

  /** The curated-corpus shipping artifact: write the document set
    * hive-partitioned by the given columns (conventionally
    * `split, lang`), so downstream training jobs reading one split (or
    * one language) scan ONLY those directories — partition pruning shows
    * up in the plan as a reduced `PartitionFilters`/partition count, no
    * data skipped at row level. The text-side mirror of the cube store's
    * date partitioning (`Sinks.writeCubeStore`). */
  def writeCorpusStore(df: DataFrame, path: String,
      partitionCols: Seq[String] = Seq("split", "lang")): String = {
    val missing = partitionCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing partition columns: $missing")
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    path
  }
}
