package graft

import graft.functions.BitmapExprs
import graft.functions.BitmapExprs._
import org.apache.spark.sql.functions._

/** Exact mergeable distinct-count sketch laws: bitmap_agg == exact
  * COUNT(DISTINCT), union-of-parts == whole (the rollup law), canonical
  * bytes, container promotion at 4096, negative values, SQL face. */
class BitmapSpec extends SparkSpec {
  import spark.implicits._

  test("LongBitmap unit laws: add/contains/cardinality across array → " +
      "bitmap promotion, negatives, canonical serialize round-trip") {
    val bm = new LongBitmap
    val vals = (0L until 5000L).map(_ * 3L) ++ // forces bitmap containers
      Seq(-1L, -65536L, Long.MinValue, Long.MaxValue, 0L)
    vals.foreach(bm.add)
    vals.foreach(v => assert(bm.contains(v), s"missing $v"))
    bm.contains(1L) shouldBe false
    bm.cardinality shouldBe vals.distinct.size.toLong
    val rt = LongBitmap.deserialize(bm.serialize())
    rt.cardinality shouldBe bm.cardinality
    // canonical: same set inserted in reverse serializes identically
    val bm2 = new LongBitmap
    vals.reverse.foreach(bm2.add)
    java.util.Arrays.equals(bm.serialize(), bm2.serialize()) shouldBe true
    // or(): array+array overflow promotion, bitmap+array, disjoint copy
    val a = new LongBitmap; (0L until 3000L).foreach(a.add)
    val b = new LongBitmap; (2000L until 6000L).foreach(b.add)
    a.or(b)
    a.cardinality shouldBe 6000L
    (0L until 6000L).forall(a.contains) shouldBe true
  }

  test("bitmapAgg == exact COUNT(DISTINCT) per group; partial " +
      "aggregation and shuffle order do not change the bytes") {
    val df = (1 to 20000).map(i =>
        (s"g${i % 3}", (i % 700).toLong * (if (i % 2 == 0) 1 else -1)))
      .toDF("g", "v").repartition(8)
    val got = df.groupBy("g")
      .agg(bitmapCount(bitmapAgg(col("v"))).as("n"))
      .as[(String, Long)].collect().toMap
    val expected = df.groupBy("g")
      .agg(countDistinct(col("v")).as("n"))
      .as[(String, Long)].collect().toMap
    got shouldBe expected
    // determinism: two different partitionings, identical sketch bytes
    val s1 = df.repartition(2).groupBy("g")
      .agg(bitmapAgg(col("v")).as("s")).orderBy("g")
      .select("s").as[Array[Byte]].collect()
    val s2 = df.repartition(7, col("v")).groupBy("g")
      .agg(bitmapAgg(col("v")).as("s")).orderBy("g")
      .select("s").as[Array[Byte]].collect()
    s1.zip(s2).foreach { case (x, y) =>
      java.util.Arrays.equals(x, y) shouldBe true }
  }

  test("rollup law: union of per-day sketches == the whole-range " +
      "distinct, without touching raw rows again") {
    val df = (1 to 10000).map(i =>
      (i % 7, (i % 450).toLong)).toDF("day", "u")
    val daily = df.groupBy("day").agg(bitmapAgg(col("u")).as("s"))
    val viaRollup = daily.agg(
      bitmapCount(bitmapUnionAgg(col("s"))).as("n"))
      .as[Long].head()
    val exact = df.select(countDistinct(col("u"))).as[Long].head()
    viaRollup shouldBe exact
    // pairwise scalar merge agrees too
    val two = daily.limit(2).select("s").as[Array[Byte]].collect()
    val ored = spark.range(1).select(
      bitmapCount(bitmapOr(lit(two(0)), lit(two(1))))).as[Long].head()
    val both = daily.limit(2)
      .agg(bitmapCount(bitmapUnionAgg(col("s")))).as[Long].head()
    ored shouldBe both
  }

  test("SQL face: graft_bitmap_agg / union / count / contains resolve " +
      "through the extensions") {
    (1 to 100).map(i => (i % 4, i.toLong % 37))
      .toDF("g", "v").createOrReplaceTempView("bm_sql")
    val got = spark.sql(
      """SELECT g, graft_bitmap_count(graft_bitmap_agg(v)) AS n
         FROM bm_sql GROUP BY g ORDER BY g""")
      .as[(Int, Long)].collect().toMap
    val expected = spark.sql(
      "SELECT g, COUNT(DISTINCT v) AS n FROM bm_sql GROUP BY g")
      .as[(Int, Long)].collect().toMap
    got shouldBe expected
    spark.sql(
      """SELECT graft_bitmap_contains(graft_bitmap_agg(v), 5L) AS c
         FROM bm_sql""").as[Boolean].head() shouldBe true
  }

  test("and/andNot laws across container forms: set semantics, empty " +
      "containers drop, results re-canonicalize") {
    def bm(vals: Seq[Long]): LongBitmap = {
      val b = new LongBitmap; vals.foreach(b.add); b
    }
    val big = (0L until 5000L).toSeq      // bitmap container
    val small = (4000L until 4100L).toSeq // array container
    val a1 = bm(big); a1.and(bm(small))
    a1.cardinality shouldBe 100L
    small.forall(a1.contains) shouldBe true
    val a2 = bm(big); a2.andNot(bm(small))
    a2.cardinality shouldBe 4900L
    a2.contains(4050L) shouldBe false
    // disjoint chunks drop entirely; canonical bytes after shrink
    val a3 = bm(Seq(1L, 100000L)); a3.and(bm(Seq(1L)))
    a3.cardinality shouldBe 1L
    java.util.Arrays.equals(a3.serialize(), bm(Seq(1L)).serialize()) shouldBe true
    // bitmap∩bitmap that shrinks below 4096 serializes like a direct build
    val b1 = bm(0L until 5000L); b1.and(bm(2500L until 7500L))
    java.util.Arrays.equals(b1.serialize(),
      bm(2500L until 5000L).serialize()) shouldBe true
    // DataFrame face: retained/churned vs exact set ops
    val d1 = (1 to 300).map(_.toLong); val d2 = (200 to 500).map(_.toLong)
    val df = Seq((1, d1), (2, d2)).toDF("day", "us")
      .select(col("day"), explode(col("us")).as("u"))
    val sk = df.groupBy("day").agg(bitmapAgg(col("u")).as("s"))
      .orderBy("day").select("s").as[Array[Byte]].collect()
    spark.range(1).select(
      bitmapCount(bitmapAnd(lit(sk(0)), lit(sk(1))))).as[Long]
      .head() shouldBe d1.toSet.intersect(d2.toSet).size.toLong
    spark.range(1).select(
      bitmapCount(bitmapAndNot(lit(sk(0)), lit(sk(1))))).as[Long]
      .head() shouldBe d1.toSet.diff(d2.toSet).size.toLong
  }

  test("type checks: non-integral values and non-binary sketches fail " +
      "at ANALYSIS with a typed message; int columns widen") {
    val df = Seq((1, 2.5, "x")).toDF("i", "d", "s")
    df.createOrReplaceTempView("bm_types")
    // ints are accepted (widen to long)
    spark.sql("SELECT graft_bitmap_count(graft_bitmap_agg(i)) FROM bm_types")
      .as[Long].head() shouldBe 1L
    // doubles fail typed at analysis, not ClassCastException on executors
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_bitmap_agg(d) FROM bm_types").collect()
    }
    e1.getMessage should include("integral")
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_bitmap_count(s) FROM bm_types").collect()
    }
    e2.getMessage should include("sketch")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT graft_bitmap_union_agg(d) FROM bm_types").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_bitmap_or(s, s) FROM bm_types").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT graft_bitmap_contains(graft_bitmap_agg(i), d) " +
          "FROM bm_types").collect()
    }
  }

  test("nulls skip; empty group yields an empty sketch with count 0") {
    val df = Seq((1, Some(5L)), (1, None), (2, None))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(bitmapCount(bitmapAgg(col("v"))).as("n"))
      .as[(Int, Long)].collect().toMap
    got shouldBe Map(1 -> 1L, 2 -> 0L)
  }
}
