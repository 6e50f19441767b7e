package graft

import graft.ops.Snapshots
import graft.ops.Snapshots.{MergeDelete, MergeUpdate, WhenMatched, WhenNotMatched, WhenNotMatchedBySource, mergeSource => src}
import org.apache.spark.sql.functions._

/** General MERGE INTO laws — [[Snapshots.mergeInto]] (ordered
  * conditional WHEN MATCHED UPDATE/DELETE, WHEN NOT MATCHED INSERT,
  * WHEN NOT MATCHED BY SOURCE) and its SQL face through
  * [[graft.plans.SnapshotDmlRule]]. */
class SnapshotMergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_gmi_").toString
    new java.io.File(d).deleteOnExit(); d
  }

  /** target: ids 1..8, v = id*10, tag = "t<id>" */
  private def target(): org.apache.spark.sql.DataFrame =
    (1 to 8).map(i => (i.toLong, i * 10.0, s"t$i")).toDF("id", "v", "tag")

  /** source: ids 3..10, d = id (3..6 matched, 9..10 unmatched, 7..8
    * matched but see per-test conditions). */
  private def source(): org.apache.spark.sql.DataFrame =
    (3 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "d")

  test("mergeInto: conditional update, conditional delete, " +
      "conditional insert, NMBS delete — full SQL semantics") {
    val p = freshDir()
    Snapshots.append(target(), p)
    // matched & d<=4  -> update v = v + 100*d
    // matched & d=5   -> delete
    // matched else    -> no clause applies, row carries unchanged
    // not matched & d>=10 -> insert (id, v=d, tag='new')
    // not matched else    -> nothing
    // NMBS & id<=1    -> delete
    Snapshots.mergeInto(spark, p, source(), Seq("id"),
      matched = Seq(
        WhenMatched(Some(src("d") <= 4.0),
          MergeUpdate(Map("v" -> (col("v") + src("d") * 100.0)))),
        WhenMatched(Some(src("d") === 5.0), MergeDelete)),
      notMatched = Seq(
        WhenNotMatched(Some(src("d") >= 10.0),
          Map("id" -> src("id"), "v" -> src("d"), "tag" -> lit("new")))),
      notMatchedBySource = Seq(
        WhenNotMatchedBySource(Some(col("id") <= 1L), MergeDelete)))
    val got = Snapshots.read(spark, p)
      .select("id", "v", "tag").as[(Long, Double, String)]
      .collect().toSet
    val expected = Set(
      // id=1 NMBS-deleted; id=2 NMBS cond false -> kept
      (2L, 20.0, "t2"),
      // 3,4 matched & d<=4 -> updated
      (3L, 330.0, "t3"), (4L, 440.0, "t4"),
      // 5 matched & d=5 -> deleted; 6,7,8 matched, no clause -> kept
      (6L, 60.0, "t6"), (7L, 70.0, "t7"), (8L, 80.0, "t8"),
      // 9 unmatched, cond false -> nothing; 10 -> inserted
      (10L, 10.0, "new"))
    got shouldBe expected
  }

  test("mergeInto: clause ORDER decides — first applicable wins") {
    val p = freshDir()
    Snapshots.append(target(), p)
    // both clauses apply to every matched row; the FIRST must win
    Snapshots.mergeInto(spark, p, source().where(col("id") <= 4L),
      Seq("id"),
      matched = Seq(
        WhenMatched(None, MergeUpdate(Map("tag" -> lit("first")))),
        WhenMatched(None, MergeDelete)))
    val got = Snapshots.read(spark, p).select("id", "tag")
      .as[(Long, String)].collect().toMap
    got(3L) shouldBe "first"
    got(4L) shouldBe "first"
    got.size shouldBe 8 // nothing deleted
  }

  test("mergeInto: unassigned insert columns become NULL; " +
      "unassigned update columns keep their value") {
    val p = freshDir()
    Snapshots.append(target(), p)
    Snapshots.mergeInto(spark, p, source(), Seq("id"),
      matched = Seq(WhenMatched(None,
        MergeUpdate(Map("v" -> lit(-1.0))))),
      notMatched = Seq(WhenNotMatched(None,
        Map("id" -> src("id"), "v" -> src("d")))))
    val rows = Snapshots.read(spark, p)
      .select("id", "v", "tag").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.isNullAt(2))).toMap
    rows(3L) shouldBe ((-1.0, false)) // update kept tag
    rows(9L) shouldBe ((9.0, true))   // insert: tag unassigned -> NULL
  }

  test("mergeInto: insert-only merge never rewrites a file " +
      "(append-shaped commit) and skips matched keys") {
    val p = freshDir()
    Snapshots.append(target(), p)
    val m0 = Snapshots.snapshotAt(spark, p).get
    Snapshots.mergeInto(spark, p, source(), Seq("id"),
      notMatched = Seq(WhenNotMatched(None,
        Map("id" -> src("id"), "v" -> src("d"), "tag" -> lit("n")))))
    val m1 = Snapshots.snapshotAt(spark, p).get
    // every v1 file carries into v2 unmoved — nothing rewritten
    m0.files.toSet.subsetOf(m1.files.toSet) shouldBe true
    val got = Snapshots.read(spark, p).select("id", "v")
      .as[(Long, Double)].collect().toMap
    got.size shouldBe 10
    got(3L) shouldBe 30.0 // matched row untouched
    got(9L) shouldBe 9.0  // unmatched inserted
  }

  test("mergeInto CDC: changeFeed is row-exact and the mirror law " +
      "holds (seed at v1 + feed == table at v2)") {
    val p = freshDir()
    Snapshots.append(target(), p)
    Snapshots.mergeInto(spark, p, source(), Seq("id"),
      matched = Seq(
        WhenMatched(Some(src("d") <= 4.0),
          MergeUpdate(Map("v" -> src("d")))),
        WhenMatched(Some(src("d") === 5.0), MergeDelete)),
      notMatched = Seq(WhenNotMatched(None,
        Map("id" -> src("id"), "v" -> src("d"), "tag" -> lit("n")))),
      notMatchedBySource = Seq(
        WhenNotMatchedBySource(Some(col("id") <= 1L), MergeDelete)))
    val feed = Snapshots.changeFeed(spark, p, 1L, 2L)
    val byType = feed.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    byType("update_preimage") shouldBe 2L  // ids 3,4
    byType("update_postimage") shouldBe 2L
    byType("delete") shouldBe 2L           // id 5 (matched), id 1 (NMBS)
    byType("insert") shouldBe 2L           // ids 9,10
    // pre-images carry OLD values, post-images NEW
    feed.where(col("_change_type") === "update_preimage" &&
        col("id") === 3L).select("v").as[Double].head() shouldBe 30.0
    feed.where(col("_change_type") === "update_postimage" &&
        col("id") === 3L).select("v").as[Double].head() shouldBe 3.0
    // the consumer law: applyChangeFeed(v1 state, feed) == v2 content
    val mirrored = Snapshots.applyChangeFeed(
      Snapshots.read(spark, p, Some(1L)), feed, Seq("id"))
    rowSet(mirrored.select("id", "v", "tag")) shouldBe
      rowSet(Snapshots.read(spark, p).select("id", "v", "tag"))
  }

  test("mergeInto: duplicate or NULL source keys fail typed; unknown " +
      "assigned column fails typed") {
    val p = freshDir()
    Snapshots.append(target(), p)
    val dup = Seq((3L, 1.0), (3L, 2.0)).toDF("id", "d")
    intercept[Snapshots.MergeSourceConflict] {
      Snapshots.mergeInto(spark, p, dup, Seq("id"),
        matched = Seq(WhenMatched(None, MergeDelete)))
    }
    val nullKey = Seq((Option.empty[Long], 1.0)).toDF("id", "d")
    intercept[Snapshots.MergeSourceConflict] {
      Snapshots.mergeInto(spark, p, nullKey, Seq("id"),
        matched = Seq(WhenMatched(None, MergeDelete)))
    }
    intercept[IllegalArgumentException] {
      Snapshots.mergeInto(spark, p, source(), Seq("id"),
        matched = Seq(WhenMatched(None,
          MergeUpdate(Map("nope" -> lit(1))))))
    }
    // the reserved prefix is guarded on the TABLE side too — a target
    // column named __gmi_* would be silently replaced by join markers
    val p2 = freshDir()
    Snapshots.append(Seq((1L, 2.0)).toDF("id", "__gmi_t"), p2)
    intercept[IllegalArgumentException] {
      Snapshots.mergeInto(spark, p2, Seq((1L, 1.0)).toDF("id", "d"),
        Seq("id"), matched = Seq(WhenMatched(None, MergeDelete)))
    }.getMessage should include("__gmi_")
  }

  test("SQL MERGE INTO: multi-clause with conditions, DELETE and " +
      "NOT MATCHED BY SOURCE routes through mergeInto by identifier") {
    val slug = System.nanoTime().toString
    val cat = s"gmi_$slug"
    val wh = freshDir()
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v DOUBLE, tag STRING)")
    target().createOrReplaceTempView(s"gmi_tgt_$slug")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM gmi_tgt_$slug")
    source().createOrReplaceTempView(s"gmi_src_$slug")
    spark.sql(
      s"""MERGE INTO $cat.db.t t USING gmi_src_$slug s ON t.id = s.id
          WHEN MATCHED AND s.d <= 4 THEN UPDATE SET v = t.v + s.d * 100
          WHEN MATCHED AND s.d = 5 THEN DELETE
          WHEN NOT MATCHED AND s.d >= 10
            THEN INSERT (id, v, tag) VALUES (s.id, s.d, 'new')
          WHEN NOT MATCHED BY SOURCE AND t.id <= 1 THEN DELETE""")
    val got = spark.table(s"$cat.db.t")
      .select("id", "v", "tag").as[(Long, Double, String)]
      .collect().toSet
    got shouldBe Set(
      (2L, 20.0, "t2"), (3L, 330.0, "t3"), (4L, 440.0, "t4"),
      (6L, 60.0, "t6"), (7L, 70.0, "t7"), (8L, 80.0, "t8"),
      (10L, 10.0, "new"))
    // EXPLAIN stays side-effect-free (rewrite emits a runnable command,
    // executed only on run)
    spark.sql(
      s"""EXPLAIN MERGE INTO $cat.db.t t USING gmi_src_$slug s
          ON t.id = s.id
          WHEN MATCHED THEN DELETE""").collect()
    spark.table(s"$cat.db.t").count() shouldBe 7L
  }

  test("SQL MERGE INTO: NMBS UPDATE assignments over target columns") {
    val slug = System.nanoTime().toString
    val cat = s"gmib_$slug"
    val wh = freshDir()
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v DOUBLE, tag STRING)")
    target().createOrReplaceTempView(s"gmib_tgt_$slug")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM gmib_tgt_$slug")
    source().where(col("id") <= 5L)
      .createOrReplaceTempView(s"gmib_src_$slug")
    spark.sql(
      s"""MERGE INTO $cat.db.t t USING gmib_src_$slug s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET tag = 'hit'
          WHEN NOT MATCHED BY SOURCE THEN UPDATE SET tag = 'stale'""")
    val tags = spark.table(s"$cat.db.t").select("id", "tag")
      .as[(Long, String)].collect().toMap
    tags(3L) shouldBe "hit"
    tags(5L) shouldBe "hit"
    tags(1L) shouldBe "stale"
    tags(8L) shouldBe "stale"
  }

  test("mergeInto over live deletion vectors: a MoR-deleted row is " +
      "NOT a match target — the source row inserts; the rewrite " +
      "keeps the deletion") {
    val p = freshDir()
    Snapshots.append(target().repartition(1), p)
    Snapshots.deleteMor(spark, p, col("id") === 3L) // v2: dv only
    // source hits the dv-deleted key 3 and the live key 4
    Snapshots.mergeInto(spark, p,
      Seq((3L, 300.0), (4L, 400.0)).toDF("id", "d"), Seq("id"),
      matched = Seq(WhenMatched(None,
        MergeUpdate(Map("v" -> src("d"))))),
      notMatched = Seq(WhenNotMatched(None,
        Map("id" -> src("id"), "v" -> src("d"), "tag" -> lit("resurrect")))))
    val got = Snapshots.read(spark, p).select("id", "v", "tag")
      .as[(Long, Double, String)].collect()
      .map { case (i, v, t) => i -> ((v, t)) }.toMap
    got(3L) shouldBe ((300.0, "resurrect")) // inserted, not updated
    got(4L) shouldBe ((400.0, "t4"))        // matched update
    got.size shouldBe 8 // 8 seed - 1 dv-deleted + 1 insert
    // CDC agrees: key 3 is an insert, key 4 an update pair
    val feed = Snapshots.changeFeed(spark, p, 2L, 3L)
    feed.where(col("id") === 3L).select("_change_type")
      .as[String].collect().toSet shouldBe Set("insert")
    feed.where(col("id") === 4L).select("_change_type")
      .as[String].collect().toSet shouldBe
      Set("update_preimage", "update_postimage")
  }

  test("mergeInto with CDC disabled: batch changeFeed falls back to " +
      "the read-time multiset diff and stays row-exact") {
    val p = freshDir()
    Snapshots.append(target(), p)
    spark.conf.set(Snapshots.CdcEnabledKey, "false")
    try {
      Snapshots.mergeInto(spark, p, source(), Seq("id"),
        matched = Seq(
          WhenMatched(Some(src("d") <= 4.0),
            MergeUpdate(Map("v" -> src("d")))),
          WhenMatched(Some(src("d") === 5.0), MergeDelete)),
        notMatched = Seq(WhenNotMatched(None,
          Map("id" -> src("id"), "v" -> src("d")))))
      Snapshots.manifestAt(spark, p, 2L).get.cdc shouldBe empty
      val feed = Snapshots.changeFeed(spark, p, 1L, 2L)
      // the diff emits NET deletes+inserts (no image pairing)
      val byKey = feed.select(col("id"), col("_change_type"))
        .as[(Long, String)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).sorted.toSeq).toMap
      byKey(3L) shouldBe Seq("delete", "insert") // updated: old out, new in
      byKey(5L) shouldBe Seq("delete")           // matched delete
      byKey(9L) shouldBe Seq("insert")           // fresh insert
      byKey.contains(6L) shouldBe false          // untouched survivor cancels
      // the consumer law still holds on the diff-shaped feed
      val mirrored = Snapshots.applyChangeFeed(
        Snapshots.read(spark, p, Some(1L)), feed, Seq("id"))
      rowSet(mirrored) shouldBe rowSet(Snapshots.read(spark, p))
    } finally spark.conf.set(Snapshots.CdcEnabledKey, "true")
  }

  test("mergeInto on a PARTITIONED table preserves the layout and " +
      "partition pruning") {
    val p = freshDir()
    Snapshots.append(
      (1 to 8).map(i => (i.toLong, if (i % 2 == 0) "even" else "odd",
        i * 10.0)).toDF("id", "par", "v"), p, Seq("par"))
    Snapshots.mergeInto(spark, p,
      Seq((2L, 999.0), (9L, 90.0)).toDF("id", "d"), Seq("id"),
      matched = Seq(WhenMatched(None, MergeUpdate(Map("v" -> src("d"))))),
      notMatched = Seq(WhenNotMatched(None, Map("id" -> src("id"),
        "par" -> lit("odd"), "v" -> src("d")))),
      notMatchedBySource = Seq(WhenNotMatchedBySource(
        Some(col("id") === 7L), MergeDelete)))
    val m = Snapshots.latestManifest(spark, p).get
    m.partitionBy shouldBe Seq("par")
    Snapshots.scanWhere(spark, p, col("par") === "even")
      .select("id", "v").as[(Long, Double)].collect().toMap shouldBe
      Map(2L -> 999.0, 4L -> 40.0, 6L -> 60.0, 8L -> 80.0)
    Snapshots.read(spark, p).where(col("id") === 9L)
      .select("par").as[String].head() shouldBe "odd"
    Snapshots.read(spark, p).where(col("id") === 7L).count() shouldBe 0L
  }

  test("mergeInto conflict: a merge prepared against a stale version " +
      "fails typed instead of dropping the interleaved commit") {
    val p = freshDir()
    Snapshots.append(target(), p)
    val prepared = Snapshots.latestManifest(spark, p).get.version
    Snapshots.append(
      Seq((99L, 990.0, "t99")).toDF("id", "v", "tag"), p)
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.mergeInto(spark, p, source(), Seq("id"),
        matched = Seq(WhenMatched(None, MergeDelete)),
        expectVersion = Some(prepared))
    }
    // nothing lost: both commits intact, no merge applied
    Snapshots.read(spark, p).count() shouldBe 9L
  }

  test("SQL MERGE INTO: schema evolution attempt fails typed") {
    val slug = System.nanoTime().toString
    val cat = s"gmie_$slug"
    val wh = freshDir()
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v DOUBLE)")
    (1 to 3).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .createOrReplaceTempView(s"gmie_src_$slug")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM gmie_src_$slug")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $cat.db.t t USING gmie_src_$slug s ON t.id = s.id
            WHEN MATCHED THEN UPDATE SET nope = s.v""")
    }
    e.getMessage should (include("nope") or include("evolve"))
  }

  test("NMBS with stats-bounded conditions prunes: files that cannot " +
      "contain a clause-satisfying row and hold no matched key carry " +
      "over UNMOVED (no full-table rewrite)") {
    val p = freshDir()
    // 4 range-clustered files over id 0..199; stats record id min/max
    Snapshots.append(
      (0 until 200).map(i => (i.toLong, i * 1.0, s"t$i"))
        .toDF("id", "v", "tag").repartitionByRange(4, col("id")), p)
    val m0 = Snapshots.snapshotAt(spark, p).get
    m0.files.size shouldBe 4
    // source matches keys 0..9 (first file); the NMBS clause's
    // condition binds id >= 150 (last file). Files 2 and 3 (ids
    // 50..149) can neither match nor satisfy the clause -> must
    // carry over byte-identical.
    Snapshots.mergeInto(spark, p,
      (0 until 10).map(i => (i.toLong, -1.0)).toDF("id", "d"),
      Seq("id"),
      matched = Seq(WhenMatched(None, MergeUpdate(Map("v" -> src("d"))))),
      notMatchedBySource = Seq(WhenNotMatchedBySource(
        Some(col("id") >= 150L), MergeUpdate(Map("tag" -> lit("aged"))))))
    val m1 = Snapshots.snapshotAt(spark, p).get
    val carried = m0.files.toSet.intersect(m1.files.toSet)
    // at least the two middle files survive unmoved (conservative
    // stats may keep boundary files as candidates, never fewer)
    carried.size should be >= 2
    // ... and correctness is untouched by the pruning
    val got = Snapshots.read(spark, p).select("id", "v", "tag")
      .as[(Long, Double, String)].collect()
    got.length shouldBe 200
    val byId = got.map(r => r._1 -> r).toMap
    byId(5L)._2 shouldBe -1.0           // matched update applied
    byId(100L) shouldBe ((100L, 100.0, "t100")) // untouched middle
    byId(175L)._3 shouldBe "aged"       // NMBS applied
    byId(149L)._3 shouldBe "t149"       // below the bound: not aged
    // an UNCONDITIONAL NMBS clause keeps the documented all-files cost
    val p2 = freshDir()
    Snapshots.append(
      (0 until 40).map(i => (i.toLong, i * 1.0, s"t$i"))
        .toDF("id", "v", "tag").repartitionByRange(4, col("id")), p2)
    val n0 = Snapshots.snapshotAt(spark, p2).get
    Snapshots.mergeInto(spark, p2,
      Seq((0L, -1.0)).toDF("id", "d"), Seq("id"),
      matched = Seq(WhenMatched(None, MergeUpdate(Map("v" -> src("d"))))),
      notMatchedBySource = Seq(WhenNotMatchedBySource(None,
        MergeUpdate(Map("tag" -> lit("all"))))))
    val n1 = Snapshots.snapshotAt(spark, p2).get
    n0.files.toSet.intersect(n1.files.toSet) shouldBe Set.empty
    Snapshots.read(spark, p2).where(col("tag") === "all")
      .count() shouldBe 39L
  }

  test("MERGE WITH SCHEMA EVOLUTION: source-only columns widen the " +
      "table (nullable ADD COLUMN commit + the merge; old rows read " +
      "null); without the clause the same statement fails typed") {
    val slug = System.nanoTime().toString
    val cat = s"gmise_$slug"
    val wh = freshDir()
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v DOUBLE)")
    (1 to 4).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .createOrReplaceTempView(s"gmise_base_$slug")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM gmise_base_$slug")
    Seq((3L, 30.0, "hot"), (9L, 90.0, "new"))
      .toDF("id", "v", "tag")
      .createOrReplaceTempView(s"gmise_src_$slug")
    // without the clause, star expansion covers TARGET columns only —
    // the extra source column is IGNORED and the schema does not move
    spark.sql(
      s"""MERGE INTO $cat.db.t t USING gmise_src_$slug s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
    spark.table(s"$cat.db.t").columns.toSeq shouldBe Seq("id", "v")
    // WITH SCHEMA EVOLUTION: Spark routes the widening through this
    // catalog's alterTable (append-evolution), re-resolves, merges
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.db.t t
          USING gmise_src_$slug s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
    val got = spark.table(s"$cat.db.t")
      .select("id", "v", "tag").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1),
        if (r.isNullAt(2)) null else r.getString(2))).toMap
    got(3L) shouldBe ((30.0, "hot"))  // matched: updated incl. new col
    got(9L) shouldBe ((90.0, "new"))  // inserted with the new col
    got(1L) shouldBe ((1.0, null))    // untouched old row reads null
    got.size shouldBe 5
    // conditional-clause (general mergeInto) shape evolves too
    Seq((1L, 100.0, "x", 7L)).toDF("id", "v", "tag", "rank")
      .createOrReplaceTempView(s"gmise_src2_$slug")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.db.t t
          USING gmise_src2_$slug s ON t.id = s.id
          WHEN MATCHED AND s.v > 50 THEN UPDATE SET rank = s.rank
          WHEN NOT MATCHED THEN INSERT *""")
    val r2 = spark.table(s"$cat.db.t").where(col("id") === 1L)
      .select("rank").collect().head
    r2.getLong(0) shouldBe 7L
    spark.table(s"$cat.db.t").where(col("id") === 3L)
      .select("rank").collect().head.isNullAt(0) shouldBe true
  }

  test("mergeInto materializes the source ONCE: a non-deterministic " +
      "source commits data that matches its own CDC sidecar exactly") {
    val p = freshDir()
    Snapshots.append(target(), p)
    // rand()-valued source: without up-front materialization the CDC
    // projections re-evaluate the source and the sidecar's values
    // diverge from the committed rows
    val nd = source().withColumn("d", rand(/*no seed*/) * 1e6)
    Snapshots.mergeInto(spark, p, nd, Seq("id"),
      matched = Seq(WhenMatched(None,
        MergeUpdate(Map("v" -> src("d"))))),
      notMatched = Seq(WhenNotMatched(None,
        Map("id" -> src("id"), "v" -> src("d"), "tag" -> lit("n")))))
    val table = Snapshots.read(spark, p)
      .select("id", "v").as[(Long, Double)].collect().toMap
    val feed = Snapshots.changeFeed(spark, p, 1L, 2L)
    val posts = feed
      .where(col("_change_type").isin("update_postimage", "insert"))
      .select("id", "v").as[(Long, Double)].collect().toMap
    // every post-image / insert value in the sidecar IS the table value
    posts.foreach { case (id, v) => table(id) shouldBe v }
    posts.keySet shouldBe (3L to 10L).toSet
  }

  test("SQL MERGE/UPDATE clause payloads with subqueries reject TYPED " +
      "at analysis time (they cannot round-trip through SQL text)") {
    val slug = System.nanoTime().toString
    val cat = s"gmiq_$slug"
    val wh = freshDir()
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v DOUBLE)")
    (1 to 3).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .createOrReplaceTempView(s"gmiq_src_$slug")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM gmiq_src_$slug")
    // a non-canonical merge shape (clause condition) carrying an IN
    // subquery — previously a runtime parse failure AFTER analysis
    val e1 = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $cat.db.t t USING gmiq_src_$slug s ON t.id = s.id
            WHEN MATCHED AND t.id IN (SELECT id FROM gmiq_src_$slug)
              THEN UPDATE SET v = 0.0""")
    }
    e1.getMessage.toLowerCase should include("subquer")
    val e2 = intercept[Exception] {
      spark.sql(s"UPDATE $cat.db.t SET v = 0.0 " +
        s"WHERE id IN (SELECT id FROM gmiq_src_$slug WHERE v > 1)")
    }
    e2.getMessage.toLowerCase should include("subquer")
    // the statements changed nothing
    spark.table(s"$cat.db.t").where(col("v") === 0.0)
      .count() shouldBe 0L
  }
}
