package graft

import org.apache.spark.sql.functions._
import graft.plans.BandJoinRule

class BandJoinRuleSpec extends SparkSpec {
  import spark.implicits._
  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BandJoinRule
    try f finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq BandJoinRule)
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
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
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
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        "10485760b")
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
}
