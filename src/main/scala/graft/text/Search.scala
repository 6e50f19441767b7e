package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword-retrieval primitives over the corpus — the "find the documents
  * about X" query surface a curation pipeline needs for eval-set mining,
  * targeted inspection, and boilerplate hunting.
  *
  * Engine-exactness follows the LM pattern: every per-(doc, term) score
  * contribution is quantized at 1e-9 into a LONG before the per-doc sum
  * (integer addition is order-free, so partial aggregation cannot flip a
  * bit; the JVM-vs-libm `ln` last-ulp difference sits far below the
  * quantum), and the final score rounds to 6.
  */
object Search {

  private def toks(text: Column): Column = graft.functions.TextHashExprs.wsTokens(text)

  /** BM25 (Robertson et al.) scores for a literal query-term set: one row
    * per document matching >= 1 term — (id, n_terms, n_hits, score) with
    * n_terms = distinct query terms present, n_hits = total term
    * instances.
    *
    * idf = ln((N - df + 0.5)/(df + 0.5) + 1)   (Lucene's non-negative form)
    * tf-sat = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * 100 TB shape: the corpus-stats pass is one exact long aggregation
    * (count + Σdl) collapsed to driver literals; the hit stream explodes
    * tokens but FILTERS to the query-term set map-side, so only matches
    * reach the (doc, term) shuffle; document frequencies are <= |terms|
    * rows (collected, embedded as a literal map — no join). Two corpus
    * scans total, zero wide joins. */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val t = toks(col(textCol))
    val stats = docs
      .agg(count(lit(1)).as("_n"), sum(size(t).cast("long")).as("_sdl"))
      .head()
    val nDocs = stats.getLong(0)
    require(nDocs > 0, "bm25 needs a non-empty corpus")
    val sumDl = stats.getLong(1)
    val avgdl = sumDl.toDouble / nDocs.toDouble
    val hits = docs
      .select(col(idCol), size(t).cast("double").as("_dl"),
        explode(t).as("_t"))
      .where(col("_t").isin(terms: _*))
    val tf = hits.groupBy(col(idCol), col("_dl"), col("_t"))
      .agg(count(lit(1)).as("_tf"))
    val dfMap: Map[String, Long] = tf.groupBy("_t")
      .agg(count(lit(1)).as("_df")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def idfOf(df: Long): Double =
      math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
    val present = terms.filter(dfMap.contains)
    if (present.isEmpty)
      // schema-stable empty result: derive from tf so idCol keeps the
      // corpus id type instead of a hardcoded long
      return tf.where(lit(false))
        .select(col(idCol), lit(0L).as("n_terms"),
          lit(0L).as("n_hits"), lit(0.0).as("score"))
    val idfLit = map(present.flatMap(tm =>
      Seq(lit(tm), lit(idfOf(dfMap(tm))))): _*)
    val tfc = col("_tf").cast("double")
    val contrib = element_at(idfLit, col("_t")) *
      ((tfc * lit(k1 + 1.0)) /
        (tfc + lit(k1) * (lit(1.0 - b) + lit(b) * (col("_dl") / lit(avgdl)))))
    tf
      .withColumn("_q", round(contrib * lit(1000000000.0), 0).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum(col("_tf")).as("n_hits"),
        sum(col("_q")).as("_qs"))
      .withColumn("score", round(
        col("_qs").cast("double") / lit(1000000000.0), 6))
      .drop("_qs")
  }

  /** Persisted INVERTED INDEX for [[bm25]] — the search twin of the
    * persisted IVF vector store and the MinHash dedup index: the corpus
    * tokenization pass is paid ONCE at build, and serving never touches
    * the document text.
    *
    * Layout under `path`:
    *   - `postings/` — one row per (doc, term): (idCol, dl, term, tf),
    *     PARTITIONED BY `p_bucket = pmod(hash(term), nBuckets)` so a
    *     query's term set prunes to its buckets' DIRECTORIES — like the
    *     IVF store's probed cells, |query buckets|/nBuckets becomes a
    *     scan-BYTES fraction, not just a post-scan filter.
    *   - `df/` — the Zipf-sized (term, df) table, same bucketing.
    *   - `stats/` — 1 row (n_docs, sum_dl): the exact longs [[bm25]]
    *     derives its idf/avgdl literals from.
    *   - `params/` — (n_buckets, id_col) so serving can never silently
    *     mismatch the build (the MinHash-store contract).
    *
    * Write clustering: rows cluster by (bucket, bounded doc-hash salt)
    * so each bucket directory gets a fixed small file count while the
    * write spreads over ~nBuckets·salt tasks — the salted
    * `writeCubeStore` shape, never one-task-per-directory. The salt is
    * the `spark.graft.search.filesPerDir` session knob (default 4;
    * raise it when a 100 TB ingest needs more writer tasks than
    * buckets, set 1 for small corpora where extra files are pure commit
    * overhead). k1/b are QUERY-time knobs, not build parameters, so one
    * build serves any scoring calibration. */
  /** Shared posting projection: (idCol, dl, term, tf, p_bucket), one row
    * per (doc, distinct term) — identical rows to
    * `groupBy(id, dl, term).count` (dl is constant per doc; termCounts
    * reduces per doc in one native map pass), with NO shuffle. */
  private def postingRows(docs: DataFrame, textCol: String, idCol: String,
      nBuckets: Int): DataFrame = {
    // project the token array ONCE: `size` and `termCounts` both consume
    // it, and a single-select formulation would evaluate the tokenizer
    // twice per row (CollapseProject keeps the two-step split because
    // the alias is non-cheap and referenced twice — r14, guide §4/§7.2)
    docs
      .select(col(idCol), toks(col(textCol)).as("_tk"))
      .select(col(idCol), size(col("_tk")).cast("double").as("dl"),
        explode(graft.functions.TextHashExprs.termCounts(col("_tk")))
          .as(Seq("term", "tf")))
      .withColumn("p_bucket", pmod(hash(col("term")), lit(nBuckets)))
  }

  /** Bounded intra-bucket write salt (`spark.graft.search.filesPerDir`,
    * default 4): the number of writer tasks — and files — per bucket
    * directory. */
  private def filesPerDir(
      spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption("spark.graft.search.filesPerDir")
      .map(_.toInt).getOrElse(4).max(1)

  /** Cluster postings for a bucket-partitioned write: one task set per
    * bucket, salted by doc hash when filesPerDir > 1. */
  private def clusterForWrite(postings: DataFrame, idCol: String,
      fpd: Int): DataFrame =
    if (fpd <= 1) postings.repartition(col("p_bucket"))
    else postings.repartition(col("p_bucket"),
      pmod(hash(col(idCol)), lit(fpd)))

  def writeSearchIndex(docs: DataFrame, textCol: String, idCol: String,
      path: String, nBuckets: Int = 16): String = {
    require(nBuckets > 0, "writeSearchIndex needs nBuckets > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    // SHUFFLE-FREE posting generation: the per-doc (term, tf) reduction
    // happens inside the native termCounts map pass, so the corpus-sized
    // (doc, term) stream is never exchanged — the only shuffles left are
    // the bucket-clustered write and the Zipf-sized df rollup. Cached so
    // the df rollup and stats don't re-tokenize.
    val postings = postingRows(docs, textCol, idCol, nBuckets).persist()
    try {
      clusterForWrite(postings, idCol, filesPerDir(spark))
        .write.mode("overwrite").partitionBy("p_bucket")
        .parquet(s"$path/postings")
      postings.groupBy(col("term"), col("p_bucket"))
        .agg(count(lit(1)).as("df"))
        .repartition(col("p_bucket"))
        .write.mode("overwrite").partitionBy("p_bucket")
        .parquet(s"$path/df")
      writeStats(docs, postings, path, overwrite = true)
    } finally postings.unpersist(false)
    Seq((nBuckets, idCol)).toDF("n_buckets", "id_col")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
    path
  }

  /** Corpus stats WITHOUT a second tokenize pass: Σdl ≡ Σtf over the
    * cached posting rows (a doc with null text yields no postings and
    * contributes nothing to the token sum — exactly the direct
    * formulation's null-skipping SUM), and n_docs is a tokenize-free
    * count (null-text docs DO count, again matching the direct
    * formulation). */
  private def writeStats(docs: DataFrame, postings: DataFrame,
      path: String, overwrite: Boolean): Unit = {
    val nDocs = docs.count()
    val mode = if (overwrite) "overwrite" else "append"
    postings.agg(lit(nDocs).as("n_docs"),
        sum(col("tf")).as("sum_dl"))
      .coalesce(1).write.mode(mode).parquet(s"$path/stats")
  }

  /** Incremental index MAINTENANCE — the production shape for a corpus
    * that grows daily: a shard of NEW documents (ids disjoint from the
    * stored corpus — the same contract as any inverted-index segment)
    * appends into all three tables. Postings append into the term-bucket
    * directories (dynamic-partition append — only touched buckets gain
    * files); the df and stats tables are APPEND-ONLY SEGMENT rows that
    * [[bm25Indexed]] aggregates at serve time (df rows per term stay
    * <= |segments|, stats rows = |segments| — both Zipf/constant-sized,
    * nothing is read-modify-written). Because every per-(doc, term)
    * contribution depends only on the GLOBAL (n_docs, sum_dl, df)
    * aggregates, any sequence of appends is result-identical to one
    * [[writeSearchIndex]] over the concatenated corpus (law-tested).
    * Like the IVF store's frozen centroids, the bucket hash is frozen by
    * the params table, so segments always agree on directory layout. */
  def appendSearchIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, shard: DataFrame, textCol: String): String = {
    val params = spark.read.parquet(s"$path/params").head()
    val (nBuckets, idCol) = (params.getInt(0), params.getString(1))
    val postings = postingRows(shard, textCol, idCol, nBuckets).persist()
    try {
      clusterForWrite(postings, idCol, filesPerDir(spark))
        .write.mode("append").partitionBy("p_bucket")
        .parquet(s"$path/postings")
      postings.groupBy(col("term"), col("p_bucket"))
        .agg(count(lit(1)).as("df"))
        .repartition(col("p_bucket"))
        .write.mode("append").partitionBy("p_bucket")
        .parquet(s"$path/df")
      writeStats(shard, postings, path, overwrite = false)
    } finally postings.unpersist(false)
    path
  }

  /** Serve BM25 from a [[writeSearchIndex]] store: result identical to
    * [[bm25]] over the source corpus with the same terms/k1/b (oracle
    * shared verbatim) — same Lucene idf from the stored exact longs,
    * same 1e-9 long-quantized per-(doc, term) contributions, so the
    * integer per-doc sums cannot differ.
    *
    * 100 TB shape: query-term buckets are evaluated through Spark's own
    * murmur3 (a 1-row projection — build and probe can never disagree on
    * the hash), land as PARTITION filters on both the postings and df
    * scans, and the df collect is <= |terms| rows. Zero corpus scans at
    * serve time. */
  def bm25Indexed(spark: org.apache.spark.sql.SparkSession, path: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Indexed needs at least one query term")
    val params = spark.read.parquet(s"$path/params").head()
    val (nBuckets, idCol) = (params.getInt(0), params.getString(1))
    val buckets = spark.range(1)
      .select(array(terms.map(tm =>
        pmod(hash(lit(tm)), lit(nBuckets))): _*).as("bs"))
      .head().getSeq[Int](0).distinct
    // stats/df rows are append-only SEGMENTS ([[appendSearchIndex]]) —
    // aggregate them: exact long sums, so segmented == one-shot
    val st = spark.read.parquet(s"$path/stats")
      .agg(sum(col("n_docs")).as("n"), sum(col("sum_dl")).as("sdl")).head()
    val nDocs = st.getLong(0)
    require(nDocs > 0, "bm25Indexed needs a non-empty index")
    require(!st.isNullAt(1),
      "bm25Indexed: index stats carry n_docs > 0 but a NULL token total " +
        "(a build over all-null text) — rebuild the index over real text")
    val avgdl = st.getLong(1).toDouble / nDocs.toDouble
    val probe = col("p_bucket").isin(buckets: _*) &&
      col("term").isin(terms: _*)
    val dfMap: Map[String, Long] = spark.read.parquet(s"$path/df")
      .where(probe).groupBy(col("term")).agg(sum(col("df")).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tf = spark.read.parquet(s"$path/postings").where(probe)
    val present = terms.filter(dfMap.contains)
    if (present.isEmpty)
      return tf.where(lit(false))
        .select(col(idCol), lit(0L).as("n_terms"),
          lit(0L).as("n_hits"), lit(0.0).as("score"))
    def idfOf(df: Long): Double =
      math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
    val idfLit = map(present.flatMap(tm =>
      Seq(lit(tm), lit(idfOf(dfMap(tm))))): _*)
    val tfc = col("tf").cast("double")
    val contrib = element_at(idfLit, col("term")) *
      ((tfc * lit(k1 + 1.0)) /
        (tfc + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / lit(avgdl)))))
    tf
      .withColumn("_q", round(contrib * lit(1000000000.0), 0).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("n_hits"),
        sum(col("_q")).as("_qs"))
      .withColumn("score", round(
        col("_qs").cast("double") / lit(1000000000.0), 6))
      .drop("_qs")
  }

  /** Top-k retrieval over any scored run ([[bm25]]/[[bm25Indexed]]
    * output): rank = (score desc, id asc) — the deterministic order
    * every other ranking surface here uses. Plans as
    * TakeOrderedAndProject (per-partition heaps of k rows), never a
    * global sort — the shape a production search endpoint serves. */
  def topK(scored: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, "topK needs k > 0")
    scored.orderBy(col("score").desc, col(idCol)).limit(k)
  }

  /** Reciprocal-rank fusion (Cormack & Clarke 2009) of two retrieval
    * runs — the HYBRID search shape: a lexical run (BM25) and a semantic
    * run (ANN cosine) over the same corpus merge without any score
    * calibration, because only RANKS enter the fused score:
    *
    *   rrf(d) = 1/(k0 + rank_A(d)) + 1/(k0 + rank_B(d))
    *
    * with a per-run depth cut and contribution exactly 0 for a document
    * absent from a run. Ranks are deterministic — (score desc, id asc)
    * per query — and the two reciprocal terms are added in fixed run
    * order, so the double result is bit-reproducible cross-engine.
    *
    * 100 TB shape: each run ranks under a window PARTITIONED BY the
    * query keys (per-query candidate lists are already bounded by the
    * run's own top-k), the depth cut caps the fusion join at
    * ≤ 2·depth rows per query, and there is no global sort — the final
    * presentation cut is the caller's [[topK]] (TakeOrderedAndProject).
    *
    * Runs must carry `keyCols ++ (idCol, scoreCol)`. Output:
    * (keyCols, idCol, rank_a, rank_b, rrf) with null rank for a side
    * that did not retrieve the document. */
  def rrfFuse(runA: DataFrame, runB: DataFrame, idCol: String,
      scoreCol: String, keyCols: Seq[String], k0: Int = 60,
      depth: Int = 60): DataFrame = {
    require(keyCols.nonEmpty,
      "rrfFuse needs the query key columns (use a literal for one query)")
    require(k0 > 0 && depth > 0, "k0 and depth must be positive")
    import org.apache.spark.sql.expressions.Window
    def ranked(run: DataFrame, rn: String): DataFrame = {
      val w = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(col(scoreCol).desc, col(idCol))
      run.select((keyCols :+ idCol).map(col) :+
          row_number().over(w).cast("long").as(rn): _*)
        .where(col(rn) <= depth)
    }
    val a = ranked(runA, "rank_a")
    val b = ranked(runB, "rank_b")
    a.join(b, keyCols :+ idCol, "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(k0.toDouble) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0.toDouble) + col("rank_b")), lit(0.0)),
        9))
  }

  /** Corpus-wide most-frequent n-token windows — the boilerplate detector
    * (headers, cookie banners, license blurbs surface immediately).
    * Returns the `k` most frequent n-grams as (gram, n_occurrences),
    * count ties broken by gram ascending so the cut is deterministic.
    *
    * 100 TB shape: windows come from the one-pass native TokenWindows
    * expression; the count is a partial-aggregated hash shuffle on the
    * gram; the top-k is TakeOrderedAndProject — per-partition heaps of k
    * rows, never a global sort. */
  def topNgrams(docs: DataFrame, textCol: String, n: Int,
      k: Int): DataFrame =
    docs.select(explode(graft.functions.TextHashExprs
        .tokenWindows(lower(trim(col(textCol))), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("gram"))
      .limit(k)

  /** The standard rank-quality discount 1/log2(rank+1), precomputed
    * driver-side so BOTH engines consume identical literals — libm vs
    * JVM log differ in the last ulp, and a metric must not depend on
    * which library computed the discount. */
  def dcgDiscounts(k: Int): Seq[Double] =
    (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))

  /** Ranking-quality metrics (MRR, DCG@k / nDCG@k) for a scored
    * retrieval run — the eval row every search/RAG deployment tracks.
    * Input = [[bm25]]'s output (or any (id, n_terms, score) frame);
    * ranking = score desc, id asc (scores are 1e-9-quantized, so the
    * order is engine-exact); graded gain = `n_terms`; "relevant" =
    * `n_terms >= relMinTerms` (multi-term matches — with the default 2,
    * single-term hits rank but don't count as relevant, so MRR is
    * non-trivial).
    *
    * One output row: (n_matched, n_relevant, first_rel_rank, mrr,
    * dcg, idcg, ndcg). first_rel_rank/mrr are 0 when nothing is
    * relevant.
    *
    * Engine-exactness: the DCG folds run in RANK order on both sides
    * (array fold here, ordered SUM in the replay) over the shared
    * [[dcgDiscounts]] literals, so every addition sequence is
    * identical. 100 TB shape: top-k is TakeOrderedAndProject; the
    * first-relevant rank is computed WITHOUT a global window — the best
    * relevant row (1-row broadcast) is counted against the rows ranked
    * above it; the only collected lists are the top-k gains (≤ k) and
    * the relevant-set gains (bounded by the query's posting lists — a
    * metrics run is per-query, not per-corpus). */
  def rankingMetrics(scored: DataFrame, idCol: String, k: Int = 10,
      relMinTerms: Int = 2): DataFrame = {
    val discounts = array(dcgDiscounts(k).map(lit): _*)
    val gain = col("n_terms").cast("double")
    // top-k by (score desc, id): struct sorts ascending, so negate score
    val topK = scored
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .select(struct((-col("score")).as("ns"), col(idCol).as("id"),
        gain.as("g")).as("r"))
      .agg(collect_list(col("r")).as("rs"))
      .select(transform(sort_array(col("rs")), x => x.getField("g"))
        .as("top_gains"))
    val rel = scored.where(col("n_terms") >= relMinTerms)
    // IDCG gains: the k largest relevant gains, descending
    val idealK = rel.select(gain.as("g"))
      .orderBy(col("g").desc)
      .limit(k)
      .agg(sort_array(collect_list(col("g")), asc = false)
        .as("ideal_gains"))
    val counts = scored.agg(count(lit(1)).as("n_matched"))
    val nRel = rel.agg(count(lit(1)).as("n_relevant"))
    // best relevant row → rank = 1 + |rows ordered strictly above it|
    val best = rel.orderBy(col("score").desc, col(idCol)).limit(1)
      .select(col("score").as("_bs"), col(idCol).as("_bid"))
    val firstRank = scored.crossJoin(broadcast(best))
      .where(col("score") > col("_bs") ||
        (col("score") === col("_bs") && col(idCol) < col("_bid")))
      .agg((count(lit(1)) + 1).as("first_rel_rank"))
    def fold(gains: Column): Column = aggregate(
      zip_with(gains, discounts, (g, d) => coalesce(g * d, lit(0.0))),
      lit(0.0), (acc, x) => acc + x)
    counts.crossJoin(nRel).crossJoin(topK).crossJoin(idealK)
      .crossJoin(firstRank.select(
        coalesce(col("first_rel_rank"), lit(0L)).as("first_rel_rank")))
      .select(
        col("n_matched"), col("n_relevant"),
        when(col("n_relevant") === 0, lit(0L))
          .otherwise(col("first_rel_rank")).as("first_rel_rank"),
        when(col("n_relevant") === 0, lit(0.0))
          .otherwise(lit(1.0) / col("first_rel_rank")).as("mrr"),
        fold(col("top_gains")).as("dcg"),
        fold(col("ideal_gains")).as("idcg"),
        when(col("n_relevant") === 0, lit(0.0))
          .otherwise(fold(col("top_gains")) / fold(col("ideal_gains")))
          .as("ndcg"))
  }
}
