package graft.tools

import graft.bitemporal.XtDb
import graft.plans.Explain
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 scaling probe for INCREMENTAL snapshot maintenance (verdict
  * r13 Next #1's "Done" gate): on a declared-layout table, append a
  * CONSTANT-size backlog and fold it; the fold (event fold + snapshot
  * fold) must stay flat across a 25× table-size range, the snapshot must
  * serve immediately after every fold, and the declared-key join time
  * over the folded snapshot must stay flat across fold cycles — the
  * verdict-13 "known trade" (snapshot refreshed only at geometric full
  * compactions) measured closed. The full compact at the end is the cost
  * the fold path REPLACES per cycle.
  *
  * Cost model being demonstrated: the snapshot fold is O(delta + touched
  * buckets) — the delta's key locality decides how many buckets rewrite.
  * The probe uses a 2%-of-keyspace delta (the layout's use case: hot keys
  * cluster); a uniformly-spread delta degrades to O(snapshot) read+write
  * but still never shuffles untouched rows' join serving.
  *
  * Usage: SnapshotFoldProbe [nIdsCommaList] [folds] [backlogRows] [spread]
  * `spread` = confined (default: delta keys in 2% of the key space — the
  * layout's use case) | uniform (worst case: every bucket touched, the
  * fold degrades to an O(snapshot) read+write, measured honestly) |
  * point (round 15: the CDC/point-update regime — the delta updates 8
  * hot ids, the event fanout is byte-derived so bucket size is capped,
  * and the fold's RESOLVE input must stay flat in files AND records as
  * the table grows: the bucket-pruned read is O(changed buckets ×
  * capped bucket bytes), never O(event log)).
  * Prints one JSON line per scale point.
  */
object SnapshotFoldProbe {
  def main(args: Array[String]): Unit = {
    val nIdsList = args.lift(0).getOrElse("150000,750000,3750000")
      .split(",").map(_.trim.toLong).toSeq
    val folds = args.lift(1).map(_.toInt).getOrElse(3)
    val backlogRows = args.lift(2).map(_.toLong).getOrElse(20000L)
    val spread = args.lift(3).getOrElse("confined")
    // optional 5th arg: snapshotFold.broadcastMaxIds override, to measure
    // the shuffle semi-join degradation on both sides of the gate
    val bcastGate = args.lift(4)
    // optional 6th arg: versions per id in the base table (round 16 —
    // the event log is versions× the snapshot, so the history-depth gap
    // between the event-log and snapshot+delta resolve paths is
    // measurable); optional env GRAFT_PROBE_RESOLVE_MODE forces
    // spark.graft.snapshotFold.resolveMode for the comparison rows
    val versions = args.lift(5).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.autoCompact.maxLag", "-1")
    // point regime: cap bucket bytes so the event fanout SCALES with the
    // table (the production cost model) instead of sitting at the floor
    if (spread == "point")
      spark.conf.set("spark.graft.eventBucketBytes", (256L * 1024).toString)
    val counters = EngineMetrics.install(spark)
    bcastGate.foreach(g =>
      spark.conf.set("spark.graft.snapshotFold.broadcastMaxIds", g))
    sys.env.get("GRAFT_PROBE_RESOLVE_MODE").foreach(m =>
      spark.conf.set("spark.graft.snapshotFold.resolveMode", m))
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val keySpace = 20000L
    nIdsList.foreach { nIds =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_sprobe_$nIds").toString
      val db = new XtDb(spark, root)
      // point regime: size the DECLARED fanout by rows too (a deployment
      // sizes buckets by bytes) — touched-key-bucket cost is then capped
      val snapBuckets =
        if (spread == "point") math.max(32, (nIds / 25000).toInt) else 32
      db.declareLayout("ft", "k", snapBuckets)
      (1 to versions).foreach(vr =>
        db.putDocs("ft", spark.range(1, nIds + 1)
          .selectExpr("id AS _id", s"CAST(id % $keySpace AS INT) AS k",
            s"id * 3 + $vr AS v")))
      val (_, fullSec) = time(db.compact("ft"))
      val dim = spark.range(0, 400)
        .selectExpr("CAST(id AS INT) AS k", "id * 11 AS w")
        .repartition(32, col("k")).cache()
      dim.count()
      def joinAgg(): (Long, Int) = db.currentSnapshotIfValid("ft") match {
        case Some(snap) =>
          val j = snap.join(dim, Seq("k")).agg(count(lit(1))).cache()
          val n = j.head().getLong(0)
          // exchanges of the JOIN itself (the serving-relevant measure —
          // the global count() above it always adds its own
          // single-partition gather, which is not a serving cost)
          val ex = Explain.report(
            db.currentSnapshotIfValid("ft").get.join(dim, Seq("k")))
            .shuffleExchanges
          j.unpersist()
          (n, ex)
        case None => (-1L, -1)
      }
      joinAgg() // warm
      var next = nIds + 1
      val cycles = (1 to folds).map { _ =>
        val kmod = if (spread == "uniform") keySpace else 400L
        if (spread == "point")
          // updates to 8 hot ids, key stable per id — the changed-iid
          // set prunes the EVENT read to ≤8 buckets and the snapshot
          // rewrite to ≤8 key-buckets
          db.putDocs("ft", spark.range(next, next + backlogRows)
            .selectExpr("CAST(1 + id % 8 AS BIGINT) AS _id",
              "CAST(1 + id % 8 AS INT) AS k", "id AS v"))
        else
          db.putDocs("ft", spark.range(next, next + backlogRows)
            .selectExpr("id AS _id", s"CAST(id % $kmod AS INT) AS k",
              "id AS v"))
        next += backlogRows
        Thread.sleep(300) // drain listener events from the put
        val recs0 = counters.inputRecords.get
        val (_, foldSec) = time(db.compactIncremental("ft"))
        Thread.sleep(300) // listener bus is async
        val foldRecords = counters.inputRecords.get - recs0
        val valid = db.currentSnapshotIfValid("ft").isDefined
        // round 15: the fold's RESOLVE input after the changed-iid bucket
        // prune — must stay flat as nIds grows while the delta is constant
        val resolveFiles = EngineMetrics.lastFoldResolveFiles.size
        val liveFiles = EngineMetrics.lastFoldLiveFileCount
        // round 16: which resolve path the fold took (the bulk regime
        // must go snapshot+delta — the event log not read at all)
        val resolveMode = EngineMetrics.lastFoldResolveMode
        val ((rows, exchanges), joinSec) = time(joinAgg())
        (foldSec, joinSec, valid, rows, exchanges, resolveFiles, liveFiles,
          foldRecords, resolveMode)
      }
      val (_, reFullSec) = time(db.compact("ft"))
      def fmt(xs: Seq[Double]) =
        xs.map(x => f"$x%.3f").mkString("[", ",", "]")
      println(
        s"""{"probe":"snapshot_fold","n_ids":$nIds,"spread":"$spread",""" +
        s""""versions":$versions,"forced_mode":"${sys.env
          .getOrElse("GRAFT_PROBE_RESOLVE_MODE", "auto")}",""" +
        s""""bcast_gate":${bcastGate.getOrElse("500000")},""" +
        s""""backlog_rows":$backlogRows,"buckets":32,""" +
        s""""full_compact_sec":${f"$fullSec%.3f"},""" +
        s""""fold_secs":${fmt(cycles.map(_._1))},""" +
        s""""join_secs":${fmt(cycles.map(_._2))},""" +
        s""""snapshot_valid_after_each_fold":${cycles.forall(_._3)},""" +
        s""""fold_resolve_files":${cycles.map(_._6).mkString("[", ",", "]")},""" +
        s""""fold_live_files":${cycles.map(_._7).mkString("[", ",", "]")},""" +
        s""""fold_input_records":${cycles.map(_._8).mkString("[", ",", "]")},""" +
        s""""fold_resolve_modes":${cycles.map(c => "\"" + c._9 + "\"")
          .mkString("[", ",", "]")},""" +
        s""""join_exchanges":${cycles.map(_._5).max},""" +
        s""""rows_last":${cycles.last._4},""" +
        s""""refull_compact_sec":${f"$reFullSec%.3f"}}""")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(root))
    }
    spark.stop()
  }
}
