package graft

import org.apache.spark.sql.functions._
import graft.plans.BandJoinRule

class BandJoinRuleSpec extends SparkSpec {
  import spark.implicits._
  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  // broadcast disabled by default in these tests: the fixtures are tiny
  // LocalRelations, which the tiny-bounds guard would (correctly) leave
  // to BroadcastNestedLoopJoin — the guard has its own test below
  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BandJoinRule
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq BandJoinRule)
    }
  }

  private def pts = (1 to 200).map(i => (i.toLong,
    t(f"2024-01-01 ${i % 24}%02d:${(i * 7) % 60}%02d:00"))).toDF("pid", "pts")
  private def ivs = (1 to 40).map { i =>
    val h = i % 22
    (i.toLong, t(f"2024-01-01 $h%02d:00:00"),
      t(f"2024-01-01 ${h + 1}%02d:30:00"))
  }.toDF("iid", "lo", "hi")

  test("pure band join rewrites to a binned equi-join: same rows, no " +
      "nested-loop/cartesian, SMJ on the bin") {
    val expected = pts.join(ivs,
        col("pts") >= col("lo") && col("pts") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    withRule {
      val j = pts.join(ivs,
        col("pts") >= col("lo") && col("pts") <= col("hi"))
      val plan = j.queryExecution.executedPlan.toString
      plan should not include "BroadcastNestedLoopJoin"
      plan should not include "CartesianProduct"
      plan should include("SortMergeJoin")
      plan should include("_graft_band_bin")
      j.select("pid", "iid").as[(Long, Long)].collect().toSet shouldBe expected
      // output schema restored — helper bin columns are projected away
      j.columns.toSeq shouldBe Seq("pid", "pts", "iid", "lo", "hi")
    }
  }

  test("tiny-bounds guard: a broadcastable bounds side is left to " +
      "BroadcastNestedLoopJoin, larger ones still rewrite") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BandJoinRule
    try {
      // default 10 MB broadcast threshold is live: a 40-row LocalRelation
      // bounds side sits far under broadcastSkipBytes → untouched
      val j = pts.join(ivs,
        col("pts") >= col("lo") && col("pts") <= col("hi"))
      j.queryExecution.optimizedPlan.toString should
        not include "_graft_band_bin"
      j.queryExecution.executedPlan.toString should
        include("BroadcastNestedLoopJoin")
      // shrinking the skip budget to zero re-enables the rewrite
      spark.conf.set("spark.graft.bandJoin.broadcastSkipBytes", "0")
      try {
        val j2 = pts.join(ivs,
          col("pts") >= col("lo") && col("pts") <= col("hi"))
        j2.queryExecution.optimizedPlan.toString should
          include("_graft_band_bin")
      } finally spark.conf.unset("spark.graft.bandJoin.broadcastSkipBytes")
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq BandJoinRule)
  }

  test("maxBins guard: an interval spanning more bins than the cap " +
      "fails loudly instead of exploding unbounded") {
    withRule {
      spark.conf.set("spark.graft.bandJoin.maxBins", "3")
      try {
        // 1h30m intervals at 1h bins span 2-3 bins → under the cap of 3?
        // no: span counts bins covered = bin(hi)-bin(lo)+1 <= 3 is ok;
        // use a 1-DAY interval to exceed it
        val wide = Seq((1L, t("2024-01-01 00:00:00"),
          t("2024-01-02 23:00:00"))).toDF("iid", "lo", "hi")
        val j = pts.join(wide,
          col("pts") >= col("lo") && col("pts") <= col("hi"))
        val e = intercept[Exception] { j.count() }
        // raise_error may surface wrapped in SparkException layers
        val msgs = Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).map(_.getMessage).mkString("\n")
        msgs should include("graft band-join rewrite")
        // under the cap the same query runs (and stays rewritten)
        spark.conf.set("spark.graft.bandJoin.maxBins", "100")
        val ok = pts.join(wide,
          col("pts") >= col("lo") && col("pts") <= col("hi"))
        ok.queryExecution.optimizedPlan.toString should
          include("_graft_band_bin")
        ok.count() shouldBe pts.where(col("pts") >= t("2024-01-01 00:00:00")
          && col("pts") <= t("2024-01-02 23:00:00")).count()
      } finally spark.conf.unset("spark.graft.bandJoin.maxBins")
    }
  }

  test("strict bounds and reversed operand order rewrite too") {
    val expected = pts.join(ivs,
        col("lo") < col("pts") && col("hi") > col("pts"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    withRule {
      val j = pts.join(ivs, col("lo") < col("pts") && col("hi") > col("pts"))
      j.queryExecution.optimizedPlan.toString should include("_graft_band_bin")
      j.select("pid", "iid").as[(Long, Long)].collect().toSet shouldBe expected
    }
  }

  test("the rule leaves equi-joins and band-plus-equality joins alone") {
    val l = Seq((1L, "a", t("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val r = Seq(("a", t("2024-01-01 09:00:00"), t("2024-01-01 11:00:00")))
      .toDF("k", "lo", "hi")
    withRule {
      val equi = l.join(r, Seq("k"))
      equi.queryExecution.optimizedPlan.toString should
        not include "_graft_band_bin"
      val bandEq = l.join(r, l("k") === r("k") &&
        col("ts") >= col("lo") && col("ts") <= col("hi"))
      bandEq.queryExecution.optimizedPlan.toString should
        not include "_graft_band_bin"
      bandEq.count() shouldBe 1
    }
  }

  test("rule is idempotent and bin width is configurable") {
    withRule {
      spark.conf.set("spark.graft.bandJoin.binMicros", (600L * 1000000).toString)
      try {
        val j = pts.join(ivs,
          col("pts") >= col("lo") && col("pts") <= col("hi"))
        val once = BandJoinRule(j.queryExecution.optimizedPlan)
        once.toString shouldBe BandJoinRule(once).toString
        // still row-exact at the non-default width
        j.count() shouldBe pts.join(ivs,
          col("pts") >= col("lo") && col("pts") <= col("hi"))
          .queryExecution.optimizedPlan.stats.rowCount
          .map(_.toLong).getOrElse(j.count())
      } finally spark.conf.unset("spark.graft.bandJoin.binMicros")
    }
  }

  test("mirrored sides (point table on the right) rewrite as well") {
    val expected = ivs.join(pts,
        col("pts") >= col("lo") && col("pts") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    withRule {
      val j = ivs.join(pts,
        col("pts") >= col("lo") && col("pts") <= col("hi"))
      j.queryExecution.optimizedPlan.toString should include("_graft_band_bin")
      j.select("pid", "iid").as[(Long, Long)].collect().toSet shouldBe expected
    }
  }

  test("NULL interval bounds drop through the rewrite (no spurious " +
      "maxBins raise_error), even without inferred IsNotNull constraints") {
    // r7 advice: the maxBins guard's LessThan evaluates to null for a
    // NULL lo/hi and a bare If would take the raise_error branch —
    // exactly the rows the inner join is about to drop. With constraint
    // propagation DISABLED (no inferred IsNotNull filters to save us),
    // the null-safe guard must let them explode to zero rows.
    val nullIvs = Seq(
      (1L, Option(t("2024-01-01 02:00:00")), Option(t("2024-01-01 03:30:00"))),
      (2L, None, Option(t("2024-01-01 05:00:00"))),
      (3L, Option(t("2024-01-01 06:00:00")), None))
      .toDF("iid", "lo", "hi")
    val saved = spark.conf.get("spark.sql.constraintPropagation.enabled")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    try {
      val expected = pts.join(nullIvs,
          col("pts") >= col("lo") && col("pts") <= col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      expected.map(_._2) shouldBe Set(1L) // null-bound intervals match nothing
      withRule {
        val j = pts.join(nullIvs,
          col("pts") >= col("lo") && col("pts") <= col("hi"))
        j.queryExecution.optimizedPlan.toString should include("_graft_band_bin")
        j.select("pid", "iid").as[(Long, Long)].collect().toSet shouldBe expected
      }
    } finally
      spark.conf.set("spark.sql.constraintPropagation.enabled", saved)
  }
}
