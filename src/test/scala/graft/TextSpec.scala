package graft

import graft.text.{Classifier, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish regex") {
    val df = Seq("Hello, world! How are you?").toDF("text")
    val r = df.select(
      TextAnalysis.tokenCountWs(col("text")).as("ws"),
      TextAnalysis.tokenCountBpe(col("text")).as("bpe")).head()
    r.getInt(0) shouldBe 5
    r.getInt(1) shouldBe 8 // Hello , world ! How are you ?
  }

  test("langId picks the language with most marker tokens") {
    val df = Seq(
      ("1", "the cat and the dog of the house with hats"),
      ("2", "der Hund und die Katze mit der Maus"),
      ("3", "xyzzy plugh")).toDF("id", "text")
    val r = df.select(col("id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(row => row.getString(0) -> row.getString(1)).toMap
    r("1") shouldBe "en"
    r("2") shouldBe "de"
    r("3") shouldBe null
  }

  test("langIdScript: script-majority prior, kana-ja rule, and the " +
      "ASCII law — bit-identical to langId on every ASCII input") {
    def scripted(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("text").as("_t"))
        .select(col("id"), col("_t"),
          graft.functions.UnicodeExprs.scriptCounts(col("_t")).as("_sc"))
        .select(col("id"),
          TextAnalysis.langIdScript(col("_t"), col("_sc")).as("l"))
    val df = Seq(
      ("ru", "ab привет мир"),
      ("zh", "中文測試的句子"),
      // kana present and han+kana beats latin -> ja even with han > kana
      ("ja", "漢字漢字漢字ひら"),
      ("ko", "한국어 테스트"),
      ("el", "ελληνικά"),
      ("he", "שלום עולם"),
      ("ar", "اللغة"),
      ("hi", "नमस्ते"),
      // latin majority with stray cyrillic -> falls to stopword path
      ("en", "the cat and the dog of the house да")
    ).toDF("id", "text")
    val got = scripted(df).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    got.foreach { case (want, g) => g shouldBe want }
    // the ASCII law: script counts are all zero on ASCII, so labels are
    // bit-identical to the stopword heuristic (null included)
    val ascii = Seq(
      ("1", "the cat and the dog of the house with hats"),
      ("2", "der Hund und die Katze mit der Maus"),
      ("3", "el los con por el"),
      ("4", "xyzzy plugh"),
      ("5", "")).toDF("id", "text")
    val a = scripted(ascii).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val b = ascii.select(col("id"),
        TextAnalysis.langId(col("text")).as("l")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    a shouldBe b
  }

  test("shingles builds distinct word n-grams") {
    val df = Seq("a b c b c").toDF("text")
    val r = df.select(TextAnalysis.shingles(col("text"), 2).as("s"))
      .head().getSeq[String](0).toSet
    r shouldBe Set("a b", "b c", "c b")
  }

  test("jaccard of shingle sets") {
    val df = Seq(("a b c", "b c d")).toDF("t1", "t2")
    val r = df.select(Dedup.jaccard(
      TextAnalysis.shingles(col("t1"), 1),
      TextAnalysis.shingles(col("t2"), 1)).as("j")).head().getDouble(0)
    r shouldBe 0.5 +- 1e-12 // {b,c} / {a,b,c,d}
  }

  test("exact dedup groups identical texts, keeps min id") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val r = Dedup.exact(df, "text", "doc_id")
      .collect().map(row => row.getLong(1) -> row.getLong(2)).toMap
    r shouldBe Map(1L -> 2L, 3L -> 1L) // keep_id → n_copies
  }

  test("minhash LSH finds near-duplicate pairs and exact-verifies jaccard") {
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 40) "changed" else s"token$i").mkString(" ")
    val other = (100 to 140).map(i => s"word$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(df, "text", "doc_id", shingleN = 3, k = 32,
      bands = 8, threshold = 0.5).collect()
    pairs.map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe Set((1L, 2L))
    pairs.head.getDouble(2) should be > 0.8
  }

  test("simhash blocking finds every planted pair at Hamming ≤ 6 (exact recall)") {
    // adversarial spread: d flipped bits land in d DIFFERENT 8-bit bands —
    // the worst case for band blocking (the old 4×16 single-band scheme
    // silently missed every such pair with d ≥ 4)
    val base = 0x0123456789abcdefL
    val rows = scala.collection.mutable.Buffer((0L, base))
    val expected = (1 to 6).map { d =>
      var h = base
      (0 until d).foreach(b => h ^= (1L << (b * 8 + (b % 8))))
      rows += ((d.toLong, h))
      (0L, d.toLong)
    }
    val df = rows.toSeq.toDF("id", "h")
    val got = Dedup.simhashPairsFromHashes(df, "h", "id", maxDist = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    expected.foreach(p => got should contain(p))
  }

  test("simhash: identical → distance 0; near-dup close; unrelated far") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val nearDup = base + " extra"
    val other = (1 to 60).map(i => s"zzz$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, nearDup), (4L, other))
      .toDF("doc_id", "text")
    val h = df.select(col("doc_id"), Dedup.simhash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    h(1L) shouldBe h(2L)
    java.lang.Long.bitCount(h(1L) ^ h(3L)) should be <= 8
    java.lang.Long.bitCount(h(1L) ^ h(4L)) should be > 10
  }

  test("fingerprint is deterministic and separates different content") {
    val df = Seq(("A b  C", "a b c", "a b d")).toDF("t1", "t2", "t3")
    val r = df.select(
      TextAnalysis.fingerprint(col("t1")),
      TextAnalysis.fingerprint(col("t2")),
      TextAnalysis.fingerprint(col("t3"))).head()
    r.getLong(0) shouldBe r.getLong(1) // case/space-normalized
    r.getLong(0) should not be r.getLong(2)
  }

  test("quality score components produce quarter scores in [0,1]") {
    val good = (1 to 60).map(i => "the quick brown fox and").mkString(" ")
    val df = Seq(good, "x").toDF("text")
    val r = df.select(TextAnalysis.qualityScore(col("text"))).collect().map(_.getDouble(0))
    r(0) shouldBe 1.0
    r(1) should be <= 0.5
  }

  test("sampleFraction is deterministic, partition-stable, and shuffle-free") {
    import graft.text.Sampling
    val df = spark.range(10000).toDF("doc_id")
    val s1 = Sampling.sampleFraction(df, "doc_id", 0.25)
      .collect().map(_.getLong(0)).toSet
    // same ids again, and the same ids under a different partitioning —
    // rand()-based sampling guarantees neither
    Sampling.sampleFraction(df, "doc_id", 0.25)
      .collect().map(_.getLong(0)).toSet shouldBe s1
    Sampling.sampleFraction(df.repartition(7), "doc_id", 0.25)
      .collect().map(_.getLong(0)).toSet shouldBe s1
    // LCG is uniform enough for a ±10% band at n=10k
    s1.size.toDouble shouldBe 2500.0 +- 250.0
    // a pure filter: no exchange in the plan
    Sampling.sampleFraction(df, "doc_id", 0.25)
      .queryExecution.executedPlan.toString should not include "Exchange"
    Sampling.sampleFraction(df, "doc_id", 0.0).count() shouldBe 0
    Sampling.sampleFraction(df, "doc_id", 1.0).count() shouldBe 10000
  }

  test("sampleStratified keeps exactly n per stratum, smallest hash first") {
    import graft.text.Sampling
    val df = spark.range(1000).toDF("doc_id")
      .withColumn("lang", when(col("doc_id") % 2 === 0, "en").otherwise("de"))
    val out = Sampling.sampleStratified(df, Seq("lang"), "doc_id", 10)
    out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("en" -> 10L, "de" -> 10L)
    // the selection is the n smallest portable hashes per stratum —
    // cross-check against an independent window formulation
    val want = df.withColumn("hv", Sampling.portableHash(col("doc_id")))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("hv"), col("doc_id"))))
      .where(col("rn") <= 10).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    out.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe want
    // a stratum smaller than n keeps all its rows
    val tiny = df.where(col("doc_id") < 3)
    Sampling.sampleStratified(tiny, Seq("lang"), "doc_id", 10)
      .count() shouldBe 3
  }

  test("packByBudget fills packs contiguously and overflows by at most one doc") {
    import graft.text.Packing
    val df = spark.range(200).toDF("doc_id")
      .withColumn("lang", when(col("doc_id") % 2 === 0, "en").otherwise("de"))
      .withColumn("w", (col("doc_id") % 7 + 1) * 100)
    val out = Packing.packByBudget(df, Seq("lang"), "doc_id", "w", 1000L)
    // pack ids are dense from 0 within each stratum
    val packs = out.groupBy("lang", "pack_id")
      .agg(sum("w").as("tot"), count(lit(1)).as("n"))
      .collect()
    packs.map(_.getLong(1)).min shouldBe 0
    // each pack's PRECEDING boundary rule: total - last doc < budget
    // (contiguous fill can overflow by at most the final doc's weight);
    // verify via the defining property instead: every row's preceding
    // cumulative weight within its pack is < budget
    val byRow = Packing.packByBudget(df, Seq("lang"), "doc_id", "w", 1000L)
      .withColumn("hv", graft.text.Sampling.portableHash(col("doc_id")))
    val rows = byRow.orderBy("lang", "hv", "doc_id").collect()
    var cum = Map.empty[(String, Long), Long] // (lang, pack) -> running
    rows.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[Long]("pack_id"))
      val before = cum.getOrElse(key, 0L)
      (before < 1000L) shouldBe true // preceding weight fits the budget
      cum += key -> (before + r.getAs[Long]("w"))
    }
    // deterministic: same assignment under a different partitioning
    val again = Packing.packByBudget(df.repartition(13), Seq("lang"),
      "doc_id", "w", 1000L)
      .select("doc_id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.select("doc_id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe again
  }

  test("assignSplit: whole groups land in one split, proportions near weights") {
    import graft.text.Sampling
    val df = spark.range(20000).toDF("doc_id")
      .withColumn("domain", concat(lit("site"), (col("doc_id") % 500).cast("string")))
    val out = Sampling.assignSplit(df, "domain",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // leakage control: every domain maps to exactly one split
    out.groupBy("domain").agg(countDistinct("split").as("n"))
      .agg(max("n")).head().getLong(0) shouldBe 1
    // proportions approximate the weights (500 groups, +-10% absolute)
    val frac = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / 20000).toMap
    frac("train") shouldBe 0.8 +- 0.1
    (frac("val") + frac("test")) shouldBe 0.2 +- 0.1
    // deterministic under repartitioning
    val again = Sampling.assignSplit(df.repartition(7), "domain",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap shouldBe again
    // a pure projection: no shuffle
    out.queryExecution.executedPlan.toString should not include "Exchange"
  }

  test("packByBudget: oversized docs keep ordinals dense; bad weights fail loudly") {
    import graft.text.Packing
    // one 5x-budget doc among unit-weight docs: the raw boundary ordinal
    // would skip several pack numbers — dense_rank must close the gaps
    val df = spark.range(20).toDF("doc_id")
      .withColumn("lang", lit("en"))
      .withColumn("w", when(col("doc_id") === 7, 5000L).otherwise(400L))
    val packs = Packing.packByBudget(df, Seq("lang"), "doc_id", "w", 1000L)
      .select("pack_id").distinct().collect().map(_.getLong(0)).sorted
    packs.head shouldBe 0
    packs shouldBe (0L until packs.length).toArray // dense, no holes
    // negative weight → loud failure, not silent divergence
    val bad = spark.range(3).toDF("doc_id")
      .withColumn("lang", lit("en"))
      .withColumn("w", when(col("doc_id") === 1, -5L).otherwise(10L))
    an[Exception] should be thrownBy
      Packing.packByBudget(bad, Seq("lang"), "doc_id", "w", 1000L).collect()
  }

  test("normalizeText: control chars to spaces, runs collapsed, trimmed") {
    val df = Seq(
      "  hello\tworld  ",
      "a\u0000b\u0007c",
      "tabs\t\tand\n\nnewlines",
      "   ",
      "clean").toDF("t")
    val got = df.select(
      graft.text.TextAnalysis.normalizeText(col("t"))).collect()
      .map(_.getString(0))
    got shouldBe Array(
      "hello world", "a b c", "tabs and newlines", "", "clean")
  }

  test("normalizeUnicode: NFKC fold + category strip, and the ASCII " +
      "law — bit-identical to normalizeText on every ASCII input") {
    // NFKC cases: ligature, fullwidth, circled digit, superscript,
    // combining-sequence composition, NBSP/ideographic space → space;
    // category cases: Cf (ZWSP, soft hyphen) removed, Cc → space
    val cases = Seq(
      "\ufb01nance" -> "finance",
      "\uff26\uff55\uff4c\uff4c" -> "Full",
      "circled \u2460 and x\u00b2" -> "circled 1 and x2",
      "e\u0301clair" -> "\u00e9clair",
      "a\u00a0b\u3000c" -> "a b c",
      "zero\u200bwidth so\u00adft" -> "zerowidth soft",
      "ctl\u0007here\n" -> "ctl here",
      "\u4e2d\u6587 \u043f\u0440\u0438" ->
        "\u4e2d\u6587 \u043f\u0440\u0438")
    val got = cases.map(_._1).toDF("t")
      .select(TextAnalysis.normalizeUnicode(col("t"))).collect()
      .map(_.getString(0))
    got shouldBe cases.map(_._2).toArray
    // the ASCII law: over all-ASCII strings (controls included) the
    // unicode path is bit-identical to the engine-portable ASCII path
    val rnd = new scala.util.Random(7)
    val asciiDocs = (0 until 200).map { _ =>
      new String((0 until rnd.nextInt(40)).map(_ =>
        rnd.nextInt(0x80).toChar).toArray)
    }
    val both = asciiDocs.toDF("t").select(
      TextAnalysis.normalizeText(col("t")).as("a"),
      TextAnalysis.normalizeUnicode(col("t")).as("u")).collect()
    both.foreach(r => r.getString(1) shouldBe r.getString(0))
  }

  test("scriptCounts: per-script character tallies, Common/Inherited " +
      "counted nowhere") {
    val r = Seq("ab \u4e2d\u6587\u6e2c \u043f\u0440 \u30ab\u3072 " +
        "\ud55c \u05e9\u05dc \u0639 \u03b1\u03b2 \u0928\u094d 12!?")
      .toDF("t")
      .select(graft.functions.UnicodeExprs.scriptCounts(col("t")).as("s"))
      .select("s.*").head()
    r.getLong(0) shouldBe 2L // latin: ab
    r.getLong(1) shouldBe 2L // cyrillic
    r.getLong(2) shouldBe 3L // han
    r.getLong(3) shouldBe 1L // arabic
    r.getLong(4) shouldBe 2L // devanagari (incl. virama, script Mn)
    r.getLong(5) shouldBe 1L // hangul
    r.getLong(6) shouldBe 2L // kana (katakana + hiragana)
    r.getLong(7) shouldBe 2L // greek
    r.getLong(8) shouldBe 2L // hebrew
  }

  test("tokenCountUnicode: CJK chars count as one token each, the " +
      "rest ws-tokenizes; pure-ASCII equals tokenCountWs") {
    val rows = Seq(
      "hello world",                                   // 2
      "\u4e2d\u6587\u6e2c\u8a66",                      // 4 Han chars
      "mixed \u30ab\u30ca text",                       // 2 ws + 2 kana
      "\ud55c\uad6d\uc5b4 words here",                  // 3 Hangul + 2
      "").toDF("t")
      .select(graft.text.TextAnalysis.tokenCountUnicode(col("t")))
      .collect().map(_.getLong(0))
    rows shouldBe Array(2L, 4L, 4L, 5L, 0L)
    val ascii = Seq("a b  c", "one", "x y z w").toDF("t")
    ascii.select(
        graft.text.TextAnalysis.tokenCountUnicode(col("t")).as("u"),
        graft.text.TextAnalysis.tokenCountWs(col("t")).cast("long").as("w"))
      .collect().foreach(r => r.getLong(0) shouldBe r.getLong(1))
  }

  test("repetitionSignals: hand-computed metrics on a repetitive doc") {
    // tokens: a b a b a b c  → 7 tokens, 3 distinct
    // bigrams (6): "a b"×3, "b a"×2, "b c"×1 → top 3/6
    // trigrams (5): "a b a"×2, "b a b"×2, "a b c"×1 → top 2/5
    // runs: all runs length 1
    val df = Seq((1L, "a b a b a b c"), (2L, "x x x x y")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    r1.getInt(1) shouldBe 7
    r1.getDouble(2) shouldBe (3.0 / 7) +- 1e-6
    r1.getLong(3) shouldBe 1L
    r1.getDouble(4) shouldBe 0.5 +- 1e-9          // 3/6
    r1.getDouble(5) shouldBe 0.4 +- 1e-9          // 2/5
    // doc 2: tokens x x x x y → run of 4; bigrams: "x x"×3, "x y"×1 → 3/4
    val r2 = out(2L)
    r2.getLong(3) shouldBe 4L
    r2.getDouble(4) shouldBe 0.75 +- 1e-9
    // degenerate: single token → no bigrams, frac 0, run 1
    val one = TextAnalysis.repetitionSignals(
      Seq((9L, "solo")).toDF("doc_id", "text"), "text", "doc_id").head()
    one.getInt(1) shouldBe 1
    one.getLong(3) shouldBe 1L
    one.getDouble(4) shouldBe 0.0
    one.getDouble(5) shouldBe 0.0
    // 100 TB shape: pure projection, no shuffle
    TextAnalysis.repetitionSignals(df, "text", "doc_id")
      .queryExecution.executedPlan.toString should not include "Exchange"
  }

  test("decontaminate flags docs sharing eval n-grams, counts distinct overlaps") {
    val evalDocs = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val docs = Seq(
      // contains "the quick brown fox jumps" and 4 more shifted 5-grams
      (1L, "intro the quick brown fox jumps over the lazy dog outro"),
      (2L, "completely unrelated content with different words entirely here"),
      // shares exactly one 5-gram window
      (3L, "the quick brown fox jumps elsewhere to other places now")
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(docs, evalDocs, "text", "doc_id",
      shingleN = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // eval 5-grams: 5 windows; doc1 contains all 5 of them
    out(1L) shouldBe ((5L, true))
    out(2L) shouldBe ((0L, false))
    out(3L) shouldBe ((1L, true))
  }

  test("gopherRules computes the full rule set on crafted text") {
    // 6 words (mean len (3+3+2+3+4+3)/6 = 3.0), one of 3 lines is a
    // bullet, one ends with an ellipsis, stops {the, to, and} present
    val txt = "the cat is big\n• to and\nok..."
    val out = TextAnalysis.gopherRules(
      Seq((1L, txt)).toDF("doc_id", "text"), "text", "doc_id").collect()(0)
    out.getAs[Int]("n_words") shouldBe 8
    // words: the,cat,is,big,•,to,and,ok... -> lengths 3+3+2+3+1+2+3+5=22
    out.getAs[Double]("mean_word_len") shouldBe 2.75
    out.getAs[Int]("n_stops_present") shouldBe 3
    out.getAs[Double]("frac_bullet_lines") shouldBe (1.0 / 3 +- 1e-6)
    out.getAs[Double]("frac_ellipsis_lines") shouldBe (1.0 / 3 +- 1e-6)
    out.getAs[Boolean]("gopher_pass") shouldBe false // < 50 words
    // a long well-formed doc passes
    val good = (("the be to of and that have with good text " * 10).trim)
    val out2 = TextAnalysis.gopherRules(
      Seq((2L, good)).toDF("doc_id", "text"), "text", "doc_id").collect()(0)
    out2.getAs[Boolean]("gopher_pass") shouldBe true
    // stopword presence is case-insensitive (sentence-initial 'The'/'And'
    // count toward n_stops_present, per Rae et al.)
    val cased = TextAnalysis.gopherRules(
      Seq((3L, "The cat And dog THAT ran")).toDF("doc_id", "text"),
      "text", "doc_id").collect()(0)
    cased.getAs[Int]("n_stops_present") shouldBe 3 // the, and, that
    // empty / whitespace-only text reports zero words, not one phantom
    val empty = TextAnalysis.gopherRules(
      Seq((4L, ""), (5L, "   \n  ")).toDF("doc_id", "text"),
      "text", "doc_id").collect()
    empty.foreach(_.getAs[Int]("n_words") shouldBe 0)
  }

  test("redactPii counts and redacts emails, IPs, phones in order") {
    val txt = "mail a.b+c@test.org then ping 192.168.0.1 or call +1 555 0199 ok"
    val out = TextAnalysis.redactPii(
      Seq((1L, txt)).toDF("doc_id", "text"), "text", "doc_id").collect()(0)
    out.getAs[Int]("n_emails") shouldBe 1
    out.getAs[Int]("n_ips") shouldBe 1
    out.getAs[Int]("n_phones") shouldBe 1
    out.getAs[String]("redacted") shouldBe
      "mail <EMAIL> then ping <IP> or call <PHONE> ok"
    // no false positives on clean text
    val clean = TextAnalysis.redactPii(
      Seq((2L, "no personal data here at all")).toDF("doc_id", "text"),
      "text", "doc_id").collect()(0)
    clean.getAs[Int]("n_emails") + clean.getAs[Int]("n_ips") +
      clean.getAs[Int]("n_phones") shouldBe 0
    clean.getAs[String]("redacted") shouldBe "no personal data here at all"
  }

  test("logistic classifier learns separation and trains deterministically") {
    // two separable populations in one feature: y=1 docs have many en
    // stopwords per word, y=0 docs almost none
    val rows = (0L until 200L).map { i =>
      val en = i % 2 == 0
      val stopRatio = if (en) 0.3 + (i % 7) * 0.01 else 0.02 + (i % 7) * 0.005
      (i, 5.0 + (i % 5) * 0.1, stopRatio, if (en) 1.0 else 0.0)
    }
    val df = rows.toDF("doc_id", "f_mwl", "f_stop", "y")
    val w = Classifier.trainLogistic(df, Seq("f_mwl", "f_stop"), "y",
      iters = 5, lr = 0.5)
    val scored = Classifier.score(df, Seq("f_mwl", "f_stop"), w)
      .groupBy("y").agg(avg("score").as("m")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    scored(1.0) should be > scored(0.0) // learned the right direction
    w(2) should be > 0.0                // stopword weight is positive
    // bit-identical weights on any input partitioning (long-sum gradients)
    for (parts <- Seq(1, 7, 32)) {
      Classifier.trainLogistic(df.repartition(parts),
        Seq("f_mwl", "f_stop"), "y", iters = 5, lr = 0.5).toSeq shouldBe w.toSeq
    }
  }

  test("bigram LM: in-distribution text scores lower nll than novel text") {
    val ref = "the cat sat on the mat " * 20
    val docs = Seq(
      (1L, ref.trim),                         // the training distribution
      (2L, "the cat sat on the mat again"),   // mostly seen bigrams
      (3L, "zeta xylo qwerty vortex plumb")   // all-unseen → backoff floor
    ).toDF("doc_id", "text")
    val lm = graft.text.LanguageModel.trainBigramLm(docs, "text")
    // conditional probabilities: P(cat|the)=0.5 (the→cat / the→mat)
    val pCat = lm.where(col("gram") === "the cat").select("logp")
      .head().getDouble(0)
    math.exp(pCat) shouldBe 0.5 +- 1e-9
    val scored = graft.text.LanguageModel
      .scoreBigramLm(docs, lm, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // docs 1-3 are all IN the training corpus: the template doc scores
    // best, the one-word edit a bit worse, the singleton-gram doc is
    // perfectly predicted (every gram has P=1 under its own statistics)
    scored(1L) should be < scored(2L)
    scored(3L) shouldBe 0.0
    // a HELD-OUT gibberish doc is pure backoff
    val held = Seq((9L, "totally novel words never seen anywhere before"))
      .toDF("doc_id", "text")
    val heldScore = graft.text.LanguageModel
      .scoreBigramLm(held, lm, "text", "doc_id")
      .head().getDouble(2)
    heldScore shouldBe -math.log(1e-9) +- 1e-5
    // minCount pruning drops singleton grams from the emitted table
    val pruned = graft.text.LanguageModel.trainBigramLm(docs, "text",
      minCount = 5L)
    pruned.where(col("gram") === "zeta xylo").count() shouldBe 0
    pruned.where(col("gram") === "the cat").count() shouldBe 1
  }

  test("contaminationReport counts eval shingles found in train") {
    val span = "alpha beta gamma delta epsilon" // one 5-gram
    val train = Seq(
      (1L, s"$span and more words follow here"),
      (2L, "entirely different training content with nothing shared"))
      .toDF("doc_id", "text")
    val eval = Seq(
      (100L, span),                               // 1 gram, contaminated
      (101L, "unique held out evaluation sentence present nowhere"))
      .toDF("doc_id", "text")
    val r = graft.text.Dedup.contaminationReport(train, eval, "text")
      .head()
    // eval grams: 1 (doc 100) + 3 (doc 101, 7 tokens → 3 shingles)
    r.getLong(0) shouldBe 4L
    r.getLong(1) shouldBe 1L
    r.getDouble(2) shouldBe 0.25 +- 1e-9
  }

  test("sampleByWeight: w=0 drops all, w>=1 keeps all, kept sets nest") {
    import graft.text.Sampling
    val df = (0L until 400L).map(i => (i, i.toDouble / 400.0))
      .toDF("doc_id", "w")
    Sampling.sampleByWeight(df, "doc_id", lit(0.0)).count() shouldBe 0L
    Sampling.sampleByWeight(df, "doc_id", lit(1.0)).count() shouldBe 400L
    Sampling.sampleByWeight(df, "doc_id", lit(5.0)).count() shouldBe 400L
    def kept(w: Double) = Sampling.sampleByWeight(df, "doc_id", lit(w))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val k3 = kept(0.3); val k6 = kept(0.6)
    k3.subsetOf(k6) shouldBe true
    // roughly proportional (LCG uniformity at this n)
    k3.size.toDouble shouldBe (120.0 +- 40.0)
    // per-row weight column engages row-by-row (higher-w rows survive
    // their own threshold more often)
    val perRow = Sampling.sampleByWeight(df, "doc_id", col("w")).count()
    perRow should be > 0L
    perRow should be < 400L
  }

  test("stupid-backoff trigram LM cascades trigram → bigram → unigram → OOV") {
    import graft.text.LanguageModel
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug")).toDF("doc_id", "text")
    val lm = LanguageModel.trainBackoffLm(docs, "text")
    lm.nTokens shouldBe 12L
    // trigram "the cat sat" seen once, its context bigram "the cat" once
    val t = lm.tri.where(col("gram") === "the cat sat").head()
    t.getLong(t.fieldIndex("c123")) shouldBe 1L
    t.getLong(t.fieldIndex("c12")) shouldBe 1L
    val scored = LanguageModel.scoreBackoffLm(docs, lm, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    // every trigram of doc 1 is in the model with P=1 except
    // "on the mat|rug" (context "on the" has two continuations):
    // avg_nll = -(ln1+ln1+ln(1/1)+ln(1/2))/4 over 4 trigram positions
    scored(1L)._1 shouldBe 4L
    scored(1L)._2 shouldBe (math.log(2.0) / 4) +- 1e-6
    // a doc of seen UNIGRAMS but unseen trigrams/bigrams lands exactly
    // on the α²·c/N level
    val uniOnly = Seq((9L, "mat rug dog")).toDF("doc_id", "text")
    val s9 = LanguageModel.scoreBackoffLm(uniOnly, lm, "text", "doc_id")
      .head().getDouble(2)
    s9 shouldBe -(2 * math.log(0.4) + math.log(1.0 / 12)) +- 1e-6
    // full-OOV doc: the α²/N floor
    val oov = Seq((10L, "zeta xylo qwerty")).toDF("doc_id", "text")
    val s10 = LanguageModel.scoreBackoffLm(oov, lm, "text", "doc_id")
      .head().getDouble(2)
    s10 shouldBe -(2 * math.log(0.4) + math.log(1.0 / 12)) +- 1e-6
    // backoff ORDER: seen trigrams beat bigram-backoff beats the floor
    val bi = Seq((11L, "cat sat on"))   // seen trigram in doc 1
      .toDF("doc_id", "text")
    val s11 = LanguageModel.scoreBackoffLm(bi, lm, "text", "doc_id")
      .head().getDouble(2)
    s11 should be < s9
  }

  test("duplicatedSpans flags cross-doc and within-doc repeated windows") {
    val span = "one two three four five six seven eight" // exactly 8 tokens
    val docs = Seq(
      (1L, s"$span alpha beta"),       // shares the span with doc 2
      (2L, s"prefix word $span"),
      (3L, "totally unique words that repeat nowhere else at all here"),
      (4L, s"$span and then $span")    // internal duplication counts too
    ).toDF("doc_id", "text")
    val out = graft.text.Dedup.duplicatedSpans(docs, "text", "doc_id", n = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // doc1: windows = 3 (10 tokens), the pure span window is duplicated
    out(1L)._1 shouldBe 3
    out(1L)._2 should be >= 1L
    out(2L)._2 should be >= 1L
    out(3L) shouldBe ((3L, 0L))
    out(4L)._2 should be >= 2L // both copies of the span window flagged
    // a doc shorter than the window emits zero windows
    val tiny = graft.text.Dedup.duplicatedSpans(
      Seq((9L, "too short")).toDF("doc_id", "text"), "text", "doc_id")
      .head()
    tiny.getLong(1) shouldBe 0L
    tiny.getDouble(3) shouldBe 0.0
  }

  test("corpusReport: exact totals, percentiles, mean per group") {
    val docs = Seq(
      ("en", "s1", "a b c"), ("en", "s1", "a b c d e"),
      ("en", "s1", "a"), ("de", "s2", "x y")
    ).toDF("lang", "source", "text")
    val r = graft.text.TextAnalysis
      .corpusReport(docs, "text", Seq("lang", "source"))
      .collect().map(row => (row.getString(0), row.getString(1)) -> row).toMap
    val en = r(("en", "s1"))
    en.getLong(2) shouldBe 3L        // n_docs
    en.getLong(3) shouldBe 9L        // n_tokens = 3 + 5 + 1
    en.getDouble(4) shouldBe 3.0     // p50
    en.getLong(7) shouldBe 1L        // min_chars ("a")
    en.getLong(8) shouldBe 9L        // max_chars
    en.getDouble(9) shouldBe 3.0     // mean_tokens
    r(("de", "s2")).getLong(2) shouldBe 1L
  }

  test("cdcChunkStats aligns shared spans at different offsets") {
    val tail = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha $tail"),
      (2L, s"beta gamma delta epsilon $tail"), // same span, shifted by 3
      (3L, "completely distinct words only here nothing shared")
    ).toDF("doc_id", "text")
    val out = graft.text.Dedup
      .cdcChunkStats(docs, "text", "doc_id", avgTokens = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // content-defined boundaries make the shared tail's chunks identical
    // in both docs despite different offsets — fixed windows would too,
    // but CDC dedups at CHUNK granularity (bounded index, not n_tokens
    // windows); the unique doc shares nothing
    out(1L)._2 should be >= 1L
    out(2L)._2 should be >= 1L
    out(3L)._2 shouldBe 0L
    out(1L)._1 should be >= 2L // the tail contains interior boundaries
    // deterministic under repartitioning
    val again = graft.text.Dedup
      .cdcChunkStats(docs.repartition(5), "text", "doc_id", avgTokens = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    again shouldBe out
  }

  test("removeDuplicatedSpans cuts every copy but the first occurrence") {
    val span = "one two three four five six seven eight" // exactly 8 tokens
    val docs = Seq(
      (1L, s"$span alpha beta"),        // first occurrence -> kept intact
      (2L, s"prefix word $span"),       // its copy of the span is cut
      (3L, "totally unique words that repeat nowhere else at all here"),
      (4L, s"$span and then $span")     // both internal copies cut
    ).toDF("doc_id", "text")
    val out = graft.text.Dedup
      .removeDuplicatedSpans(docs, "text", "doc_id", n = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    out(1L) shouldBe ((10L, 0L, s"$span alpha beta"))
    out(2L) shouldBe ((10L, 8L, "prefix word"))
    out(3L)._2 shouldBe 0L
    out(4L) shouldBe ((18L, 16L, "and then"))
    // a leading tab (split's empty-first-token edge) must not shift the
    // coverage positions off the window indices
    val tabbed = graft.text.Dedup.removeDuplicatedSpans(Seq(
        (1L, s"$span alpha beta"),
        (2L, s"\t$span gamma")).toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3))))
      .toMap
    tabbed(2L) shouldBe ((8L, "gamma")) // the whole span cut, exactly
  }

  test("dedupParagraphs keeps only the first (doc, pos) occurrence") {
    val docs = Seq(
      (1L, "shared para\n\nunique one"),
      (2L, "unique two\n\nshared para"),   // 'shared para' cut here
      (3L, "shared para\n\nshared para")   // both copies cut (doc 1 wins)
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    out(1L) shouldBe ((2L, 2L, "shared para\n\nunique one"))
    out(2L) shouldBe ((2L, 1L, "unique two"))
    out(3L) shouldBe ((2L, 0L, ""))
  }

  test("bm25 ranks higher-tf docs above lower, skips non-matching docs") {
    val docs = Seq(
      (1L, "spark spark query"),
      (2L, "spark table"),
      (3L, "other words here")).toDF("doc_id", "text")
    val out = graft.text.Search.bm25(docs, "text", "doc_id", Seq("spark"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    out.keySet shouldBe Set(1L, 2L)
    out(1L)._1 shouldBe 1L // one distinct term matched
    out(1L)._2 shouldBe 2L // two instances
    out(2L)._2 shouldBe 1L
    out(1L)._3 should be > out(2L)._3 // tf saturation still ranks 2 > 1
    out(2L)._3 should be > 0.0
    // idf spot check: df=2, N=3 -> idf = ln(1.6); doc 2 contribution =
    // idf * (1*2.2) / (1 + 1.2*(0.25 + 0.75*(2/(8/3.0))))
    val idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    val expected2 = idf * 2.2 / (1.0 + 1.2 * (0.25 + 0.75 * (2.0 / (8.0 / 3.0))))
    out(2L)._3 shouldBe (expected2 +- 1e-6)
  }

  test("bm25 multi-term: per-term contributions sum; absent terms ignored") {
    val docs = Seq(
      (1L, "spark merge"),
      (2L, "spark spark")).toDF("doc_id", "text")
    val out = graft.text.Search
      .bm25(docs, "text", "doc_id", Seq("spark", "merge", "notthere"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out(1L) shouldBe ((2L, 2L)) // two distinct terms, one hit each
    out(2L) shouldBe ((1L, 2L)) // one term, two hits
  }

  test("bm25 with no matching term returns an empty schema-stable frame") {
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val out = graft.text.Search.bm25(docs, "text", "doc_id", Seq("zzz"))
    out.count() shouldBe 0
    out.schema.map(f => f.name -> f.dataType.simpleString) shouldBe Seq(
      "doc_id" -> "bigint", "n_terms" -> "bigint",
      "n_hits" -> "bigint", "score" -> "double")
  }

  test("persisted search index: bm25Indexed == direct bm25 bit-exact, " +
      "non-default params; missing terms degrade identically") {
    val rnd = new scala.util.Random(11)
    val vocab = Seq("spark", "merge", "window", "table", "scan", "join",
      "alpha", "beta", "gamma", "delta")
    val docs = (0L until 60L).map(i =>
      (i, Seq.fill(3 + rnd.nextInt(12))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("search-idx").toString
    // non-default bucket count; k1/b are query-time knobs — the SAME
    // build must serve any calibration
    graft.text.Search.writeSearchIndex(docs, "text", "doc_id",
      s"$dir/idx", nBuckets = 5)
    val terms = Seq("spark", "merge", "window", "notinthecorpus")
    val direct = graft.text.Search.bm25(docs, "text", "doc_id", terms,
      k1 = 1.6, b = 0.4)
    val served = graft.text.Search.bm25Indexed(spark, s"$dir/idx", terms,
      k1 = 1.6, b = 0.4)
    served.columns.toSeq shouldBe direct.columns.toSeq
    served.collect().map(_.toSeq).toSet shouldBe
      direct.collect().map(_.toSeq).toSet
    // all-absent query: schema-stable empty on both paths, id type kept
    val none = graft.text.Search.bm25Indexed(spark, s"$dir/idx",
      Seq("zzznope"))
    none.count() shouldBe 0L
    none.schema.map(f => f.name -> f.dataType.simpleString) shouldBe Seq(
      "doc_id" -> "bigint", "n_terms" -> "bigint",
      "n_hits" -> "bigint", "score" -> "double")
  }

  test("law: appended search-index segments == one-shot build == direct " +
      "bm25 over the concatenated corpus") {
    val rnd = new scala.util.Random(23)
    val vocab = Seq("spark", "merge", "window", "scan", "join", "alpha",
      "beta", "gamma")
    def mkDocs(ids: Range) = ids.map(i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(9))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val base = mkDocs(0 until 30)
    val s1 = mkDocs(30 until 45)
    val s2 = mkDocs(45 until 70)
    val all = base.unionByName(s1).unionByName(s2)
    val dir = java.nio.file.Files.createTempDirectory("search-app").toString
    graft.text.Search.writeSearchIndex(base, "text", "doc_id",
      s"$dir/idx", nBuckets = 4)
    graft.text.Search.appendSearchIndex(spark, s"$dir/idx", s1, "text")
    graft.text.Search.appendSearchIndex(spark, s"$dir/idx", s2, "text")
    val terms = Seq("spark", "merge", "gamma")
    val served = graft.text.Search.bm25Indexed(spark, s"$dir/idx", terms)
    val direct = graft.text.Search.bm25(all, "text", "doc_id", terms)
    served.collect().map(_.toSeq).toSet shouldBe
      direct.collect().map(_.toSeq).toSet
    // one-shot rebuild over the concatenated corpus agrees too
    graft.text.Search.writeSearchIndex(all, "text", "doc_id",
      s"$dir/idx2", nBuckets = 4)
    val oneShot = graft.text.Search.bm25Indexed(spark, s"$dir/idx2", terms)
    served.collect().map(_.toSeq).toSet shouldBe
      oneShot.collect().map(_.toSeq).toSet
  }

  test("law: compacting a search index's bucket directories after many " +
      "appends leaves serving bit-identical and shrinks file counts") {
    val rnd = new scala.util.Random(41)
    val vocab = Seq("spark", "merge", "window", "scan", "alpha", "beta")
    def mkDocs(ids: Range) = ids.map(i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(7))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("search-compact")
      .toString
    spark.conf.set("spark.graft.search.filesPerDir", "1")
    try {
      graft.text.Search.writeSearchIndex(mkDocs(0 until 20), "text",
        "doc_id", s"$dir/idx", nBuckets = 4)
      (1 to 3).foreach { g =>
        graft.text.Search.appendSearchIndex(spark, s"$dir/idx",
          mkDocs(g * 20 until (g + 1) * 20), "text")
      }
    } finally spark.conf.unset("spark.graft.search.filesPerDir")
    val terms = Seq("spark", "merge")
    val before = graft.text.Search.bm25Indexed(spark, s"$dir/idx", terms)
      .collect().map(_.toSeq).toSet
    // each bucket directory accumulated one file per segment — compact
    // every bucket dir (a flat parquet dir) down to one bin
    val buckets = new java.io.File(s"$dir/idx/postings").listFiles()
      .filter(_.getName.startsWith("p_bucket="))
    buckets should not be empty
    def files(d: java.io.File) =
      d.listFiles().count(f => f.getName.endsWith(".parquet"))
    buckets.foreach { b => files(b) should be > 1 }
    buckets.foreach { b =>
      graft.ops.Compaction.compactDirectory(spark, b.toString,
        targetBytes = 1L << 30)
    }
    buckets.foreach { b => files(b) shouldBe 1 }
    val after = graft.text.Search.bm25Indexed(spark, s"$dir/idx", terms)
      .collect().map(_.toSeq).toSet
    after shouldBe before
  }

  test("termCounts: per-row tf map equals the groupBy formulation; " +
      "empty/null inputs degrade") {
    val docs = Seq((1L, "a b a a c"), (2L, "b b"), (3L, ""))
      .toDF("doc_id", "text")
    val tok = split(lower(trim(col("text"))), "\\s+")
    val viaMap = docs.select(col("doc_id"),
        explode(graft.functions.TextHashExprs.termCounts(tok))
          .as(Seq("term", "tf")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val viaGroup = docs.select(col("doc_id"), explode(tok).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    viaMap shouldBe viaGroup
    // empty text tokenizes to [""] under split (one empty token) —
    // BOTH formulations must agree on that too (doc 3 above); a null
    // text row drops from both
    val withNull = Seq((4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    withNull.select(explode(graft.functions.TextHashExprs.termCounts(
      split(lower(trim(col("text"))), "\\s+")))).count() shouldBe 0L
  }

  test("topNgrams counts full windows with deterministic tie-break") {
    val docs = Seq("a b c a b c", "z z z").toDF("text")
    val out = graft.text.Search.topNgrams(docs, "text", n = 3, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    out.head shouldBe (("a b c", 2L))
    // remaining count-1 grams surface in gram-ascending order
    out(1) shouldBe (("b c a", 1L))
    out(2) shouldBe (("c a b", 1L))
  }

  test("capPerGroup keeps top-k per group, ties to lowest id") {
    val df = Seq(
      (1L, "g1", 10L), (2L, "g1", 30L), (3L, "g1", 30L), (4L, "g1", 20L),
      (5L, "g2", 5L)).toDF("id", "g", "score")
    val kept = graft.text.Sampling
      .capPerGroup(df, Seq("g"), col("score"), "id", 2)
      .select("id").collect().map(_.getLong(0)).toSet
    kept shouldBe Set(2L, 3L, 5L) // 30-tie keeps ids 2 and 3; g2 under cap
  }

  test("capPerGroup pre-prune law: a group holding ~all rows matches the " +
      "plain window formulation") {
    import org.apache.spark.sql.expressions.Window
    // one pathologically hot group (the regime the TopKAgg pre-prune
    // exists for) + score ties spanning the cut, across 8 partitions so
    // map-side partials genuinely merge
    val rows = (0L until 500L).map(i => (i, "hot", (i % 7).toDouble)) ++
      Seq((900L, "cold", 1.0), (901L, "cold", 1.0), (902L, "cold", 2.0))
    val df = rows.toDF("id", "g", "score").repartition(8)
    val got = graft.text.Sampling
      .capPerGroup(df, Seq("g"), col("score"), "id", 5)
      .select("id", "g", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val ref = df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= 5).drop("_rn")
      .select("id", "g", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    got shouldBe ref
    got.count(_._2 == "hot") shouldBe 5
    got.count(_._2 == "cold") shouldBe 3
  }

  test("calibrationBins buckets scores with exact counts and clamped top bin") {
    val scored = Seq(
      (1L, 0.05, 0.0), (2L, 0.08, 0.0),  // bin 0: 2 rows, 0 pos
      (3L, 0.55, 1.0), (4L, 0.58, 0.0),  // bin 5: 2 rows, 1 pos
      (5L, 1.0, 1.0)                     // score 1.0 clamps into bin 9
    ).toDF("doc_id", "score", "y")
    val bins = Classifier.calibrationBins(scored, "score", "y", nBins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    bins.keySet shouldBe Set(0L, 5L, 9L)
    bins(0L) shouldBe ((2L, 0L, 0.065, 0.0))
    bins(5L) shouldBe ((2L, 1L, 0.565, 0.5))
    bins(9L) shouldBe ((1L, 1L, 1.0, 1.0))
  }

  test("unimaxSample water-fills: small sources whole, big ones equal share") {
    // sources: a=4 docs, b=6, c=40, d=40; budget 30
    // ascending (a,b,c,d): a full (4*4=16<=30), b full (6*3=18<=26),
    // suffix share = 20/2 = 10 -> p_c = p_d = 0.25
    val rows = (0L until 4L).map(i => (i, "a")) ++
      (10L until 16L).map(i => (i, "b")) ++
      (100L until 140L).map(i => (i, "c")) ++
      (200L until 240L).map(i => (i, "d"))
    val df = rows.toDF("id", "src").repartition(7)
    val kept = graft.text.Sampling.unimaxSample(df, "src", "id", budget = 30L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    bySrc("a") shouldBe 4 // kept whole
    bySrc("b") shouldBe 6 // kept whole
    // partial sources keep ~p=0.25 of rows via the LCG filter (exact
    // membership is hash-determined; the shares must at least be equal
    // in expectation and far below the full corpus)
    bySrc.getOrElse("c", 0) should be < 40
    bySrc.getOrElse("d", 0) should be < 40
    // deterministic under any partitioning
    val kept2 = graft.text.Sampling
      .unimaxSample(df.repartition(2), "src", "id", budget = 30L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    kept2.toSet shouldBe kept.toSet
    // a budget covering the whole corpus keeps every row
    graft.text.Sampling.unimaxSample(df, "src", "id", budget = 1000L)
      .count() shouldBe 90L
  }

  test("fertilityByGroup: weighted subwords-per-word, merges reduce it") {
    val docs = Seq(
      (1L, "en", "ab ab abc"),
      (2L, "de", "ab abc abc abc")).toDF("doc_id", "lang", "text")
    // zero merges: every word splits to characters, so fertility is the
    // occurrence-weighted mean word length
    val f0 = graft.text.Bpe.fertilityByGroup(docs, "text", "lang", Nil)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    f0("en") shouldBe ((3L, 7L, 2.333333)) // 2+2+3 chars over 3 words
    f0("de") shouldBe ((4L, 11L, 2.75))
    // after the one obvious merge ("a b" dominates) fertility drops
    val merges = graft.text.Bpe.trainMerges(docs, "text", 1).map(_._2)
    merges shouldBe Seq("a b")
    val f1 = graft.text.Bpe.fertilityByGroup(docs, "text", "lang", merges)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    f1("en") shouldBe 1.333333 // ab->1, ab->1, abc->2
    f1("de") shouldBe 1.75
  }

  test("unimaxSampleEpochs up-samples small sources within the epoch cap") {
    // a=4 docs (capacity 12), b=40 (capacity 120); budget 32, E=3:
    // a is full (12*2=24<=32) -> all 3 epochs; b gets 20/40 = 0.5 epochs
    // -> zero whole copies + LCG-thresholded fractional copy
    val rows = (0L until 4L).map(i => (i, "a")) ++
      (100L until 140L).map(i => (i, "b"))
    val df = rows.toDF("id", "src").repartition(5)
    val out = graft.text.Sampling
      .unimaxSampleEpochs(df, "src", "id", budget = 32L, maxEpochs = 3L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val aEpochs = out.filter(_._2 == "a").groupBy(_._1).view
      .mapValues(_.map(_._3).sorted.toSeq).toMap
    aEpochs.keySet shouldBe Set(0L, 1L, 2L, 3L)
    aEpochs.values.foreach(_ shouldBe Seq(1L, 2L, 3L)) // three full epochs
    val bRows = out.filter(_._2 == "b")
    bRows.foreach(_._3 shouldBe 1L) // fractional: at most one copy
    bRows.length should be < 40
    bRows.length should be > 5 // ~half by the LCG threshold
    // deterministic under any partitioning
    val out2 = graft.text.Sampling
      .unimaxSampleEpochs(df.repartition(2), "src", "id", 32L, 3L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    out2.toSet shouldBe out.toSet
  }

  test("BPE segmentation checkpointing law: checkpointed == unchunked") {
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newer newest new lower"),
      (3L, "wide wider widest low newer"),
      (4L, "low lower new newest wide")).toDF("doc_id", "text")
    val plain = graft.text.Bpe.trainMerges(docs, "text", 9)
    // checkpoint every 2 merges: the replace chain restarts from a
    // materialized segmentation column 4 times inside the trajectory
    val chunked = graft.text.Bpe.trainMerges(docs, "text", 9,
      checkpointEvery = 2)
    chunked shouldBe plain
  }

  test("hashed sparse logistic separates classes; deterministic on any " +
      "partitioning") {
    val docs = Seq(
      (1L, "good good good stuff", 1.0), (2L, "good good quality", 1.0),
      (3L, "bad bad bad junk", 0.0), (4L, "bad junk junk", 0.0)
    ).toDF("doc_id", "text", "y")
    def run(d: org.apache.spark.sql.DataFrame) = {
      val feats = Classifier.hashedFeatures(d, "text", "doc_id", dim = 32)
      val w = Classifier.trainLogisticHashed(feats,
        d.select("doc_id", "y"), "doc_id", "y", iters = 4, lr = 0.5)
      Classifier.scoreHashed(d.select("doc_id", "y"), feats, w, "doc_id")
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    }
    val s = run(docs)
    // positives above negatives after 4 rounds
    Seq(1L, 2L).map(s) .min should be > Seq(3L, 4L).map(s).max
    run(docs.repartition(7)) shouldBe s
    // a doc with no tokens scores sigma(0) = 0.5
    val empty = Seq((9L, "", 0.0)).toDF("doc_id", "text", "y")
    val w0 = Classifier.trainLogisticHashed(
      Classifier.hashedFeatures(docs, "text", "doc_id", 32),
      docs.select("doc_id", "y"), "doc_id", "y", iters = 1)
    Classifier.scoreHashed(empty.select("doc_id", "y"),
        Classifier.hashedFeatures(empty, "text", "doc_id", 32), w0, "doc_id")
      .head().getDouble(2) shouldBe 0.5
  }

  test("broadcast LM scorer is bit-identical to the join formulation") {
    val docs = Seq(
      (1L, "a b c a b"), (2L, "a b x"), (3L, "solo"), (4L, ""),
      (5L, "\tb c \n"), // tab/newline edges: Spark trim strips spaces only
      (6L, "c c c c c c")).toDF("doc_id", "text")
    val lm = graft.text.LanguageModel.trainBigramLm(docs, "text")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val join = key(graft.text.LanguageModel
      .scoreBigramLm(docs, lm, "text", "doc_id"))
    val bcast = key(graft.text.LanguageModel
      .scoreBigramLmBroadcast(docs, lm, "text", "doc_id"))
    bcast shouldBe join
    join.map(_._1) shouldBe Set(1L, 2L, 5L, 6L) // <2-token docs emit no row
  }

  test("oversized LM never reaches the driver: guard falls back to join") {
    val docs = Seq(
      (1L, "a b c a b"), (2L, "a b x"), (6L, "c c c c c c"))
      .toDF("doc_id", "text")
    val lm = graft.text.LanguageModel.trainBigramLm(docs, "text")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // maxLmRows=1 forces the guard for this 4-gram LM; output must be
    // bit-identical to the unguarded broadcast path (parity law above
    // makes the two formulations interchangeable)
    val guarded = graft.text.LanguageModel
      .scoreBigramLmBroadcast(docs, lm, "text", "doc_id", maxLmRows = 1L)
    guarded.queryExecution.analyzed.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    } should not be empty // join formulation aggregates; mapPartitions doesn't
    key(guarded) shouldBe key(graft.text.LanguageModel
      .scoreBigramLmBroadcast(docs, lm, "text", "doc_id"))
    // a streaming caller cannot fall back (append-mode legality): typed err
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val err = intercept[graft.OpenEoError] {
      graft.text.LanguageModel.scoreBigramLmBroadcast(
        ms.toDF.toDF("doc_id", "text"), lm, "text", "doc_id",
        maxLmRows = 1L)
    }
    err.code shouldBe "LmTooLargeToBroadcast"
  }

  test("importanceWeights scores target-like docs high, off-target low") {
    val docs = Seq(
      (1L, "a b", "en"), (2L, "a c", "zh")).toDF("doc_id", "text", "lang")
    val lmT = graft.text.LanguageModel
      .trainBigramLm(docs.where(col("lang") === "en"), "text")
    val lmB = graft.text.LanguageModel.trainBigramLm(docs, "text")
    val out = graft.text.LanguageModel
      .importanceWeights(docs, lmT, lmB, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc1: logp_t("a b")=ln(1)=0, logp_b=ln(1/2) -> ratio = ln 2
    out(1L) shouldBe (math.log(2.0) +- 1e-6)
    // doc2: unseen in target -> backoff ln(1e-9) - ln(1/2)
    out(2L) shouldBe ((math.log(1e-9) - math.log(0.5)) +- 1e-6)
  }

  test("hllDistinct: estimate within sketch error; partition-invariant") {
    val rows = (0 until 5000).map(i => ("big", s"tok$i")) ++
      (0 until 300).map(i => ("small", s"tok$i")) ++
      (0 until 30000).map(i => ("huge", s"tok$i")) // raw-branch regime
    val df = rows.toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame) = graft.text.Sketches
      .hllDistinct(d, col("v"), Seq("g"))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val est = run(df)
    est("big")._1 shouldBe 5000L // exact n_values
    est("small")._1 shouldBe 300L
    // 2048 registers -> sigma ~= 2.3%; assert ~4 sigma
    math.abs(est("big")._3 - 5000.0) / 5000.0 should be < 0.10
    math.abs(est("small")._3 - 300.0) / 300.0 should be < 0.10
    math.abs(est("huge")._3 - 30000.0) / 30000.0 should be < 0.10
    // register max/sum are order-free: any partitioning, identical bits
    run(df.repartition(13)) shouldBe est
  }

  test("hllDistinctTokens matches hllDistinct over the token explode " +
      "and ignores duplicate occurrences") {
    val df = Seq(("a", "x y x  y z"), ("a", "z x"), ("b", "q")).toDF("lang", "text")
    val out = graft.text.Sketches.hllDistinctTokens(df, "text", Seq("lang"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3))).toMap
    out("a")._1 shouldBe 7L // total token occurrences
    // 3 distinct tokens: at this cardinality HLL-with-linear-counting is
    // exact to well within rounding
    out("a")._2 shouldBe (3.0 +- 0.1)
    out("b")._2 shouldBe (1.0 +- 0.05)
  }

  test("temperatureSample: clipped head keeps all, rates deterministic " +
      "and repartition-stable") {
    val rows = (0L until 1000L).map(i => (i, "web")) ++
      (1000L until 1010L).map(i => (i, "books"))
    val df = rows.toDF("doc_id", "source")
    // alpha=0.5: w_web=sqrt(1000)~31.6, w_books=sqrt(10)~3.16; target 100
    // -> p_books = min(1, 100*0.0909/10) = 0.909.., p_web ~= 0.0909
    val out = graft.text.Sampling
      .temperatureSample(df, "source", "doc_id", 0.5, 100L)
    val bySource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected ~91 web + ~9 books; LCG realization noise is a few percent
    bySource("web").toDouble shouldBe (91.0 +- 25.0)
    bySource.getOrElse("books", 0L).toDouble shouldBe (9.0 +- 6.0)
    // tiny-source clip: target larger than the corpus keeps everything
    val all = graft.text.Sampling
      .temperatureSample(df, "source", "doc_id", 0.5, 100000L)
    all.count() shouldBe 1010L
    // deterministic under repartition
    val a = out.collect().map(_.getLong(0)).sorted
    val b = graft.text.Sampling
      .temperatureSample(df.repartition(7), "source", "doc_id", 0.5, 100L)
      .collect().map(_.getLong(0)).sorted
    b shouldBe a
  }

  test("prAtThresholds: exact confusion counts; precision NULL when " +
      "nothing predicted positive") {
    val scored = Seq((0.9, 1.0), (0.6, 0.0), (0.4, 1.0), (0.1, 0.0))
      .toDF("score", "y")
    val out = Classifier
      .prAtThresholds(scored, "score", "y", Seq(0.5, 0.95))
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5))))).toMap
    // t=0.5: predicted {0.9, 0.6} -> tp=1 fp=1 fn=1; p=0.5 r=0.5
    out(0.5) shouldBe ((1L, 1L, 1L, Some(0.5), Some(0.5)))
    // t=0.95: nothing predicted -> precision NULL, recall 0
    out(0.95) shouldBe ((0L, 0L, 2L, None, Some(0.0)))
  }

  test("aucScoreBy: per-group ranks are independent; one-class groups " +
      "yield NULL auc") {
    val scored = Seq(
      ("a", 0.8, 1.0), ("a", 0.6, 1.0), ("a", 0.6, 0.0), ("a", 0.2, 0.0),
      ("b", 0.9, 1.0), ("b", 0.1, 1.0)) // group b: positives only
      .toDF("g", "score", "y")
    val out = Classifier.aucScoreBy(scored, "score", "y", Seq("g"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
    out("a") shouldBe ((2L, 2L, Some(0.875))) // same hand-check as global
    out("b") shouldBe ((2L, 0L, None))
  }

  test("splitLeakage counts cross-split pairs only") {
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val splits = Seq((1L, "train"), (2L, "test"), (3L, "train"),
      (4L, "train")).toDF("doc_id", "split")
    val r = graft.text.Sampling
      .splitLeakage(pairs, "id_a", "id_b", splits, "doc_id", "split")
      .head()
    r.getLong(0) shouldBe 2L
    r.getLong(1) shouldBe 1L
  }

  test("aucScore: tie-aware Mann-Whitney AUC, hand-checked, " +
      "partition-invariant") {
    // asc order: 0.2(n) | tie {0.6(n), 0.6(p)} avg rank 2.5 | 0.8(p)
    // pairwise: 3 wins + 1 tie (0.5) over 4 pairs -> AUC 0.875
    val scored = Seq((0.8, 1.0), (0.6, 1.0), (0.6, 0.0), (0.2, 0.0))
      .toDF("score", "y")
    def run(d: org.apache.spark.sql.DataFrame) = Classifier
      .aucScore(d, "score", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .head
    run(scored) shouldBe ((2L, 2L, 0.875))
    run(scored.repartition(3)) shouldBe ((2L, 2L, 0.875))
    // perfect separation
    val sep = Seq((0.9, 1.0), (0.8, 1.0), (0.3, 0.0)).toDF("score", "y")
    run(sep)._3 shouldBe 1.0
  }

  test("hll shard merge: union of per-shard register tables estimates " +
      "bit-exactly like the one-pass sketch (with overlap)") {
    val rows = (0 until 4000).map(i => ("g", s"tok${i % 1500}"))
    val df = rows.toDF("g", "v")
    val whole = graft.text.Sketches.hllDistinct(df, col("v"), Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    // disjoint shards: everything (occurrence counts included) must
    // equal the one-pass sketch bit-for-bit
    def regsOf(rs: Seq[(String, String)]) = graft.text.Sketches
      .hllRegisters(rs.toDF("g", "v"), col("v"), Seq("g"))
    val shards = Seq(rows.slice(0, 1600), rows.slice(1600, 2900),
      rows.slice(2900, 4000)).map(regsOf)
    val merged = graft.text.Sketches.hllEstimate(
      graft.text.Sketches.hllMergeRegisters(shards, Seq("g")), Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    merged shouldBe whole
    // OVERLAPPING shards (replayed slice): max is idempotent, so the
    // registers — and with them n_registers and the estimate — are
    // unchanged; only the exact occurrence count double-counts
    val overlapped = graft.text.Sketches.hllEstimate(
      graft.text.Sketches.hllMergeRegisters(
        shards :+ regsOf(rows.slice(1000, 2000)), Seq("g")), Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
      .toSet
    overlapped shouldBe whole.map(t => (t._1, t._3, t._4))
  }

  test("cmsFrequencyTokens: exact on a collision-free universe, zero " +
      "for absent probes, partition-invariant") {
    val docs = Seq((1L, "a a a b b c"), (2L, "a b d")).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) = graft.text.Sketches
      .cmsFrequencyTokens(d, "text", Seq("a", "b", "c", "zz"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = run(docs)
    // 4 distinct tokens in 4x1024 buckets: collision-free here (fixed by
    // the hash, so this assertion is deterministic), making the CMS
    // upper bound exact
    est("a") shouldBe 4L
    est("b") shouldBe 3L
    est("c") shouldBe 1L
    est("zz") shouldBe 0L
    run(docs.repartition(5)) shouldBe est
  }

  test("stripBoilerplate: breadth >= minDocs strips ALL copies; " +
      "2-doc repeats survive; all-boilerplate docs vanish") {
    val footer = "subscribe now"
    val docs = Seq(
      (1L, s"alpha body\n\n$footer"),
      (2L, s"beta body\n\n$footer\n\ntwice para"),
      (3L, s"gamma body\n\n$footer"),
      (4L, "delta body\n\ntwice para"),
      (5L, footer)) // entirely boilerplate -> dropped
      .toDF("doc_id", "text")
    val out = Dedup.stripBoilerplate(docs, "text", "doc_id", minDocs = 3L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L)
    out(1L) shouldBe ((1L, "alpha body"))
    // the 2-doc "twice para" is below breadth threshold -> kept
    out(2L) shouldBe ((2L, "beta body\n\ntwice para"))
    out(4L) shouldBe ((2L, "delta body\n\ntwice para"))
  }

  test("containmentPairs finds a quoted excerpt Jaccard misses, with " +
      "deterministic direction") {
    val long = (1 to 80).map(i => s"w$i").mkString(" ")
    val excerpt = (21 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, "g", long), (2L, "g", excerpt),
      (3L, "g", "totally different tokens here nine ten eleven twelve"))
      .toDF("doc_id", "blk", "text")
    val out = Dedup.containmentPairs(docs, "text", "doc_id", Seq("blk"),
        shingleN = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out.length shouldBe 1
    out.head._1 shouldBe 2L // the excerpt is the contained side
    out.head._2 shouldBe 1L
    out.head._3 shouldBe 1.0 // every excerpt shingle is in the original
    // the same pair under symmetric Jaccard: 8 shared shingles / 78
    // union ~= 0.1 — invisible at any usable threshold
    val j = Dedup.ngramJaccardPairs(docs, "text", "doc_id", Seq("blk"),
      shingleN = 3, threshold = 0.08).collect()
    j.foreach(r => r.getDouble(2) should be < 0.15)
  }

  test("ngramJaccardPairsPrefix: identical pair set to all-pairs, and " +
      "finds cross-block pairs the blocked join cannot") {
    val rnd = new scala.util.Random(7)
    def doc(n: Int) = (0 until n).map(_ => s"t${rnd.nextInt(30)}").mkString(" ")
    val base = (0L until 30L).map(i => (i, if (i % 2 == 0) "a" else "b", doc(25)))
    // exact dup pair ACROSS blocks + a near-dup (one-token edit) pair
    val crossDup = Seq((100L, "a", base(3)._3), (101L, "b", base(3)._3))
    val near = Seq((102L, "a", base(5)._3 + " tailtok"))
    val docs = (base ++ crossDup ++ near).toDF("doc_id", "blk", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6))
    val prefix = Dedup.ngramJaccardPairsPrefix(docs, "text", "doc_id",
      shingleN = 3, threshold = 0.5).collect().map(key).toSet
    // ground truth: the blocked join with a constant block = all pairs
    val truth = Dedup.ngramJaccardPairs(
      docs.withColumn("one", org.apache.spark.sql.functions.lit(1)),
      "text", "doc_id", Seq("one"), shingleN = 3, threshold = 0.5)
      .collect().map(key).toSet
    prefix shouldBe truth
    // doc 3 lives in block "b"; its dup 100 in block "a" — cross-block
    prefix.map(p => (p._1, p._2)) should contain ((3L, 100L))
    // the (lang-style) blocked variant is blind to the cross-block pair
    val blocked = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      Seq("blk"), shingleN = 3, threshold = 0.5)
      .collect().map(key).toSet
    blocked.map(p => (p._1, p._2)) should not contain ((3L, 100L))
    blocked subsetOf prefix shouldBe true
  }

  test("ngramJaccardPairsPrefix with blockCols == blocked self-join " +
      "pair set (the cost-adaptive swap is result-invariant)") {
    val rnd = new scala.util.Random(11)
    def doc(n: Int) = (0 until n).map(_ => s"t${rnd.nextInt(30)}").mkString(" ")
    val base = (0L until 40L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", doc(25)))
    val crossDup = Seq((100L, "a", base(3)._3), (101L, "b", base(3)._3))
    val docs = (base ++ crossDup).toDF("doc_id", "blk", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6))
    val blocked = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      Seq("blk"), shingleN = 3, threshold = 0.5).collect().map(key).toSet
    val prefixBlocked = Dedup.ngramJaccardPairsPrefix(docs, "text",
      "doc_id", shingleN = 3, threshold = 0.5, blockCols = Seq("blk"))
      .collect().map(key).toSet
    prefixBlocked shouldBe blocked
    // and nearDupCanonical picks the generators around the switch knob
    // with identical results either way
    def canon(switchAt: String) = {
      spark.conf.set("spark.graft.neardup.blockSwitch", switchAt)
      try graft.text.Curation.nearDupCanonical(docs, Seq("blk"), 3, 0.5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      finally spark.conf.unset("spark.graft.neardup.blockSwitch")
    }
    canon("100000") shouldBe canon("1") // blocked path vs prefix path
  }

  test("bpe trainMerges: counts, greedy left-to-right apply, and the " +
      "(count desc, pair asc) tie-break") {
    // vocab: aaab x2, aab x1. Step 1 pairs: 'a a' = 2*2+1 = 5 (two
    // overlapping windows inside aaab), 'a b' = 2+1 = 3 -> merge 'a a'.
    // Step 2: 'aa a' = 2 (aaab-> ' aa a b '), 'a b' = 2, 'aa b' = 1 ->
    // tie 2/2 broken lexicographically: 'a b' < 'aa a' (space < 'a').
    val docs = Seq((1L, "aaab aab"), (2L, "aaab")).toDF("doc_id", "text")
    val merges = graft.text.Bpe.trainMerges(docs, "text", 2)
    merges shouldBe Seq((1, "a a", 5L), (2, "a b", 2L))
    // apply: aaab -> ' a a a b ' -> ' aa a b ' -> ' aa ab '; aab -> ' aa b '
    val toks = graft.text.Bpe
      .applyMerges(docs, "text", merges.map(_._2))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    toks shouldBe Map("aa" -> 3L, "ab" -> 2L, "b" -> 1L)
    // deterministic on any partitioning (exact integer counts + total
    // argmax order)
    graft.text.Bpe.trainMerges(docs.repartition(5), "text", 2) shouldBe merges
  }

  test("minhashLshIncremental finds cross-side near-dups only") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight while stars shine"
    val ref = Seq((1L, base), (2L, "completely different reference text " +
      "about cooking pasta with tomato sauce and fresh basil leaves today"))
      .toDF("doc_id", "text")
    val inc = Seq((10L, base + " x"), // near-copy of ref 1
      (11L, "unrelated incoming document discussing quantum computing " +
        "hardware and error correction codes at length with many words"))
      .toDF("doc_id", "text")
    val out = Dedup.minhashLshIncremental(ref, inc, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out.length shouldBe 1
    out.head._1 shouldBe 10L
    out.head._2 shouldBe 1L
    out.head._3 should be > 0.85
  }

  test("minhashIncrementalIndexed == minhashLshIncremental; params come " +
      "from the store, not the caller") {
    import spark.implicits._
    val ref = (0L until 30L).map(i =>
      (i, s"reference document number $i with some shared words"))
      .toDF("doc_id", "text")
    val inc = Seq(
      (100L, "reference document number 7 with some shared words x"),
      (101L, "completely unrelated fresh content nothing in common"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("mh-idx").toString
    // build with NON-default k so serving must read params from the store
    graft.text.Dedup.writeMinhashIndex(ref, "text", "doc_id", s"$dir/idx",
      shingleN = 3, k = 16, bands = 4)
    val served = graft.text.Dedup.minhashIncrementalIndexed(spark,
      s"$dir/idx", inc, "text", "doc_id")
    val direct = graft.text.Dedup.minhashLshIncremental(ref, inc, "text",
      "doc_id", shingleN = 3, k = 16, bands = 4)
    rowSet(served) shouldBe rowSet(direct)
    served.select("inc_id").as[Long].collect().toSet shouldBe Set(100L)
  }

  test("minhashFromHashes(shingleHashes(t)) == minhashText(t): the " +
      "single-pass index build derives bit-identical signatures") {
    import spark.implicits._
    import graft.functions.TextHashExprs
    val docs = Seq((1L, "alpha beta gamma delta alpha beta gamma"),
      (2L, "short"), (3L, "x y"), (4L, "repeated repeated repeated"),
      (5L, "  padded   whitespace\ttabs and\nnewlines here  "))
      .toDF("doc_id", "text")
    val both = docs.select(col("doc_id"),
      TextHashExprs.minhashText(lower(trim(col("text"))), 3, 16)
        .as("direct"),
      TextHashExprs.minhashFromHashes(
        TextHashExprs.shingleHashes(lower(trim(col("text"))), 3), 16)
        .as("derived"))
    both.collect().foreach { r =>
      r.getSeq[Long](1) shouldBe r.getSeq[Long](2)
    }
  }

  test("charEntropy: worked examples (0 / 1 / 2 bits) and case folding") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd"), (4L, "AaAa"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    out(1L) shouldBe ((4L, 0.0))  // one symbol → zero bits
    out(2L) shouldBe ((4L, 1.0))  // two equiprobable symbols → 1 bit
    out(3L) shouldBe ((4L, 2.0))  // four equiprobable symbols → 2 bits
    out(4L) shouldBe ((4L, 0.0))  // lowercased first: AaAa ≡ aaaa
  }

  test("rrfFuse: worked example — ranks, absent-side zero, depth cut, " +
      "deterministic ties") {
    import spark.implicits._
    // run A retrieves docs 1,2,3 (scores 9,8,7); run B retrieves 2,3,4
    // — doc 3 ties doc 2 in B so the id tie-break orders (2,3)
    val a = Seq((10L, 1L, 9.0), (10L, 2L, 8.0), (10L, 3L, 7.0))
      .toDF("qid", "doc_id", "score")
    val b = Seq((10L, 2L, 5.0), (10L, 3L, 5.0), (10L, 4L, 1.0))
      .toDF("qid", "doc_id", "score")
    val fused = graft.text.Search.rrfFuse(a, b, "doc_id", "score",
      Seq("qid"), k0 = 60, depth = 10)
      .collect().map(r => r.getLong(1) ->
        (Option(r.get(2)), Option(r.get(3)), r.getDouble(4))).toMap
    def r9(x: Double): Double = new java.math.BigDecimal(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    fused(1L) shouldBe ((Some(1L), None, r9(1.0 / 61)))
    fused(2L)._1 shouldBe Some(2L)
    fused(2L)._2 shouldBe Some(1L) // tie with 3 broken by id
    fused(3L)._2 shouldBe Some(2L)
    fused(2L)._3 shouldBe r9(1.0 / 62 + 1.0 / 61)
    fused(4L) shouldBe ((None, Some(3L), r9(1.0 / 63)))
    // depth cut: depth=2 drops doc 3 from A and doc 4 from B entirely
    val cut = graft.text.Search.rrfFuse(a, b, "doc_id", "score",
      Seq("qid"), k0 = 60, depth = 2)
    cut.where(col("doc_id") === 4L).count() shouldBe 0L
    cut.where(col("doc_id") === 3L).select("rank_a")
      .collect().head.isNullAt(0) shouldBe true
    // per-query isolation: a second query's ranks start at 1
    val a2 = a.union(Seq((11L, 9L, 1.0)).toDF("qid", "doc_id", "score"))
    val f2 = graft.text.Search.rrfFuse(a2, b, "doc_id", "score",
      Seq("qid"), k0 = 60, depth = 10)
    f2.where(col("qid") === 11L).select("rank_a")
      .as[Long].collect() shouldBe Array(1L)
  }

  test("WsSplit law: graft_ws_split(lower(trim(s))) is bit-identical to " +
      "split(lower(trim(s)), \"\\\\s+\") — values, edge tokens, schema") {
    import graft.functions.TextHashExprs
    // adversarial corpus: empty, all-separator, leading/trailing runs of
    // every \s member, multibyte UTF-8, lone surrogates-adjacent chars,
    // NBSP (NOT a Java \s separator), embedded NULs, long runs
    val cases = Seq(
      "", " ", "  ", "\t", "\t\t", "\n\r\f", "a", "a b", "a  b",
      " a", "a ", "\ta", "a\t", "a\tb\t", "\t\ta\n\nb\r\r",
      "päö€ Grüße\tMÜNCHEN", "汉字 分词　中文", // U+3000 is not \s
      "a b", "word nul  ", "x" + (" " * 100) + "y",
      (1 to 50).map(i => s"tok$i").mkString("\t"), "Mix \t\r\n OF all",
      "İstanbul ß ẞ", "\r\n", "solo")
    val df = cases.toDF("text")
    val regex = split(lower(trim(col("text"))), "\\s+")
    val native = TextHashExprs.wsTokens(col("text"))
    val both = df.select(regex.as("r"), native.as("n"))
    // identical element sequences, row by row
    both.collect().foreach { row =>
      val r = row.getSeq[String](0)
      val n = row.getSeq[String](1)
      assert(n == r, s"mismatch for ${row}")
    }
    // identical schema (array element type + containsNull)
    val rt = both.schema("r").dataType
    val nt = both.schema("n").dataType
    nt shouldBe rt
  }
}
