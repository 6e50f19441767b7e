package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * All are pure Column expressions (no UDFs) so they run inside
  * whole-stage codegen and scale linearly — at 100 TB these are the
  * map-side of the pipeline and must not leave codegen.
  */
object TextAnalysis {

  /** Stopword-marker sets per language for the n-gram/stopword language-ID
    * heuristic. Deliberately small + deterministic: language score = total
    * occurrences of its marker tokens; argmax with fixed tie order. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " with "),
    "de" -> Seq(" der ", " und ", " die ", " mit "),
    "es" -> Seq(" el ", " los ", " con ", " por "),
    "fr" -> Seq(" le ", " les ", " avec ", " dans "),
    "zh" -> Seq(" de5 ", " he2 ", " shi4 ", " zai4 "))

  /** Count non-overlapping occurrences of `needle` via length difference —
    * replicable in any SQL dialect (the DuckDB oracle uses the same
    * formula). */
  def countOccurrences(text: Column, needle: String): Column =
    ((length(text) - length(replace(text, lit(needle), lit("")))) /
      needle.length).cast("int")

  /** Language-ID: argmax of marker-token counts; null if no marker hits. */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val scores = langMarkers.map { case (lang, ms) =>
      (lang, ms.map(countOccurrences(padded, _)).reduce(_ + _))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit(null).cast("string")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Curation text normalization: ASCII control characters (incl. DEL)
    * become spaces, whitespace runs collapse to one space, ends trimmed.
    * Deliberately ASCII-level only — no Unicode case/width tailoring —
    * so any engine replays the rules byte-identically (the oracle does).
    * Pure codegen regexp chain, map-side. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(text, "[\\x00-\\x1f\\x7f]", " "), " +", " "))

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token count: word runs + standalone punctuation marks. The
    * pattern is RE2-compatible (no lookarounds) so the DuckDB oracle can
    * evaluate the very same regex. */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Quality score in [0,1]: blend of length band, punctuation density and
    * stopword ratio (the classic C4/Gopher-style cheap filters). */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val words = split(trim(text), "\\s+")
    val nWords = size(words).cast("double")
    val meanWordLen = nChars / greatest(nWords, lit(1.0))
    val punct = Seq(".", ",", "!", "?", ";", ":").map(p =>
      countOccurrences(text, p)).reduce(_ + _).cast("double")
    val punctRatio = punct / greatest(nWords, lit(1.0))
    val stop = Seq(" the ", " a ", " and ", " of ", " to ").map(s =>
      countOccurrences(concat(lit(" "), text, lit(" ")), s)).reduce(_ + _).cast("double")
    val stopRatio = stop / greatest(nWords, lit(1.0))
    val lenScore = when(nWords >= 50 && nWords <= 100000, 1.0)
      .when(nWords >= 10, 0.5).otherwise(0.0)
    val wordLenScore = when(meanWordLen >= 3 && meanWordLen <= 10, 1.0).otherwise(0.0)
    val punctScore = when(punctRatio <= 0.3, 1.0).otherwise(0.0)
    val stopScore = when(stopRatio > 0.0, 1.0).otherwise(0.0)
    round((lenScore + wordLenScore + punctScore + stopScore) / 4.0, 4)
  }

  /** Document fingerprint: 32-bit polynomial rolling hash of the
    * lowercased, whitespace-normalized token stream. aggregate() keeps the
    * fold inside the JVM expression engine. */
  def fingerprint(text: Column): Column = {
    val tokens = split(lower(trim(text)), "\\s+")
    aggregate(tokens, lit(0L),
      (acc, t) => pmod(acc * 1000003L + abs(xxhash64(t)) % 1000000007L,
        lit(2147483647L)))
  }

  /** Word n-gram shingles of size n (for Jaccard / MinHash). */
  def shingles(text: Column, n: Int): Column = {
    val tokens = split(lower(trim(text)), "\\s+")
    val idx = sequence(lit(0), greatest(size(tokens) - n, lit(0)))
    array_distinct(filter(
      transform(idx, i => concat_ws(" ", slice(tokens, i + 1, lit(n)))),
      s => s =!= ""))
  }

  /** Length of the longest run of consecutive equal elements in `arr`
    * (0 for an empty array). Single aggregate() fold — map-side, no
    * shuffle, no per-element allocation beyond the 3-field state struct. */
  def maxRunLength(arr: Column): Column =
    aggregate(arr,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, t) => {
        val nrun = when(t === acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(lit(1L))
        struct(t.as("prev"), nrun.as("run"),
          greatest(acc.getField("best"), nrun).as("best"))
      },
      acc => acc.getField("best"))

  /** Non-distinct word n-grams of the token array (empty array when fewer
    * than n tokens). */
  def tokenNgrams(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws(" ", slice(tokens, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Fraction of n-gram occurrences taken by the single most frequent
    * n-gram (0 when no n-grams). Computed map-side: sort the n-gram array,
    * then the max frequency is the longest equal-run — one sort + one fold
    * per document, no (doc, gram) shuffle. */
  def topNgramFrac(tokens: Column, n: Int): Column = {
    val grams = tokenNgrams(tokens, n)
    when(size(grams) > 0,
      maxRunLength(sort_array(grams)).cast("double") /
        size(grams).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Gopher-style repetition signals, all per-document and map-side:
    *  - n_tokens: whitespace token count
    *  - distinct_token_ratio: |distinct tokens| / |tokens|
    *  - max_token_run: longest run of the same token repeated consecutively
    *  - top_bigram_frac / top_trigram_frac: share of bigram/trigram
    *    occurrences held by the most frequent one
    * Template-generated and boilerplate text scores high on the top-n-gram
    * fractions and low on the distinct ratio; natural text is the reverse.
    * 100 TB shape: ONE native pass per document
    * ([[graft.functions.TextHashExprs.RepetitionStats]] — byte-level
    * tokenizer, hashed n-grams, long sorts), no shuffle, no UDF. The HOF
    * formulation ([[maxRunLength]]/[[topNgramFrac]]) is kept as the
    * semantic reference — it re-evaluated the tokenizer per reference and
    * sorted n-gram STRINGS through interpreted lambdas, a 40× constant
    * factor on the sf0.1 bench. */
  def repetitionSignals(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val st = graft.functions.TextHashExprs
      .repetitionStats(lower(trim(col(textCol))))
    df.select(col(idCol), st.as("_st"))
      .select(col(idCol),
        col("_st.n_tokens").as("n_tokens"),
        round(col("_st.n_distinct").cast("double") /
          greatest(col("_st.n_tokens"), lit(1)).cast("double"), 6)
          .as("distinct_token_ratio"),
        col("_st.max_run").as("max_token_run"),
        round(when(col("_st.n2") > 0,
          col("_st.top2").cast("double") / col("_st.n2").cast("double"))
          .otherwise(0.0), 6).as("top_bigram_frac"),
        round(when(col("_st.n3") > 0,
          col("_st.top3").cast("double") / col("_st.n3").cast("double"))
          .otherwise(0.0), 6).as("top_trigram_frac"))
  }
}
