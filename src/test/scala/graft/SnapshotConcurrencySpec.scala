package graft

import graft.ops.Snapshots
import org.apache.spark.sql.functions._

/** The claim a lakehouse lives or dies on, under REAL threads: N racing
  * writers (appends + a retrying merge + a vacuum under grace) must
  * lose no commit, dangle no reference, and keep in-commit timestamps
  * strictly monotonic. */
class SnapshotConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_conc_").toString
    new java.io.File(d).deleteOnExit(); d
  }

  private def tbl(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, s"r$i", i * 2.0)).toDF("id", "name", "v")

  test("4 append writers × 5 commits + retrying merge AND mergeInto + " +
      "a vacuum under grace: no lost commits, no dangling refs, " +
      "monotonic ICTs") {
    val p = freshDir()
    Snapshots.append(tbl(0 until 100), p)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def task(body: => Unit): java.util.concurrent.Future[_] =
      pool.submit(new Runnable {
        override def run(): Unit =
          try body catch { case t: Throwable => failures.add(t) }
      })
    // 4 threads × 5 disjoint-range appends: the commuting op — the
    // optimistic claim loop must retry every writer through to success
    val appends = (0 until 4).map { t =>
      task {
        (0 until 5).foreach { i =>
          val lo = 1000 + t * 1000 + i * 100
          Snapshots.append(tbl(lo until lo + 100), p)
        }
      }
    }
    // one merge (a REWRITE — conflicts raise; the writer's contract is
    // to re-plan against the new snapshot and retry)
    val mergeDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val merger = task {
      val updates = tbl(0 until 50)
        .withColumn("v", col("v") * 10)
      var attempts = 0
      while (!mergeDone.get() && attempts < 200) {
        attempts += 1
        try {
          Snapshots.merge(spark, p, updates, Seq("id"))
          mergeDone.set(true)
        } catch {
          case _: java.util.ConcurrentModificationException => // re-plan
        }
      }
    }
    // one general MERGE INTO (the r11 rewrite op) racing the same way:
    // a conditional update over a key band disjoint from the plain
    // merge's, retried on conflict like any optimistic writer
    val gmiDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val gmi = task {
      import Snapshots.{mergeSource => ms}
      val src = (50 until 100).map(i => (i.toLong, i * 100.0))
        .toDF("id", "nv")
      var attempts = 0
      while (!gmiDone.get() && attempts < 200) {
        attempts += 1
        try {
          Snapshots.mergeInto(spark, p, src, Seq("id"),
            matched = Seq(Snapshots.WhenMatched(None,
              Snapshots.MergeUpdate(Map("v" -> ms("nv"))))))
          gmiDone.set(true)
        } catch {
          case _: java.util.ConcurrentModificationException => // re-plan
        }
      }
    }
    // one vacuum mid-race with the default grace window: in-flight
    // writers' fresh files must survive it
    val vac = task {
      Thread.sleep(150)
      Snapshots.vacuum(spark, p, keepFromVersion = 1L)
    }
    (appends :+ merger :+ gmi :+ vac).foreach(_.get(
      300, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    failures.forEach(t => fail(s"writer thread failed: $t", t))
    mergeDone.get() shouldBe true
    gmiDone.get() shouldBe true

    // 1. no lost commits: 1 base + 20 appends + 2 merges = 23 data
    //    versions, every claim in the log parseable
    val vs = Snapshots.versions(spark, p)
    vs.map(_._2).count(_ == "append") shouldBe 21
    vs.map(_._2).count(_ == "merge") shouldBe 2
    vs.map(_._1) shouldBe (1L to vs.length)

    // 2. no lost rows; each rewrite applied exactly once on its
    //    disjoint key band (deterministic regardless of commit order)
    val out = Snapshots.read(spark, p)
    out.count() shouldBe (100L + 20L * 100L)
    out.where(col("id") < 50L && col("v") =!= col("id") * 20.0)
      .count() shouldBe 0L
    out.where(col("id") >= 50L && col("id") < 100L &&
      col("v") =!= col("id") * 100.0).count() shouldBe 0L

    // 3. no dangling references: every file and vector of every
    //    retained version exists on disk
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())
    (1L to vs.length).foreach { v =>
      val snap = Snapshots.snapshotAt(spark, p, Some(v)).get
      snap.files.foreach(f => assert(
        fs.exists(new org.apache.hadoop.fs.Path(s"$p/$f")),
        s"version $v references missing file $f"))
    }

    // 4. strictly monotonic in-commit timestamps across writer threads
    val ts = (1L to vs.length).map(v =>
      Snapshots.manifestAt(spark, p, v).get.ts)
    ts.zip(ts.tail).foreach { case (a, b) =>
      assert(a < b, s"ICTs not strictly monotonic: $a !< $b") }
  }
}
