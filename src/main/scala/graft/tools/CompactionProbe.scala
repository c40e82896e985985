package graft.tools

import graft.bitemporal.{Bitemporal, XtDb}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 scaling probe for incremental compaction (VERDICT r12 Next
  * #1's "Done" gate): fold a CONSTANT-size backlog into event tables of
  * increasing size and show the fold time is flat — O(backlog), not
  * O(table) — while the full rewrite (the pre-round-13 only option)
  * scales linearly. Also records asOf serving time before/after the fold
  * (the fold must restore the zero-exchange posture) and the derived
  * bucket fanout.
  *
  * Usage: CompactionProbe [nIdsCommaList] [versions] [backlogRows]
  * Defaults: 150000,750000,3750000 ids × 5 versions (= the r12 probe's
  * 18.75M-event 25× point at the top), 100000-row backlog.
  * Prints one JSON line per scale point.
  */
object CompactionProbe {
  def main(args: Array[String]): Unit = {
    val nIdsList = args.lift(0).getOrElse("150000,750000,3750000")
      .split(",").map(_.trim.toLong).toSeq
    val versions = args.lift(1).map(_.toInt).getOrElse(5)
    val backlogRows = args.lift(2).map(_.toLong).getOrElse(100000L)
    // >1 = report asOf timings as best-of-N hot (first run untimed warm)
    val hotRuns = args.lift(3).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // measurement isolation: auto-maintenance would fold the backlog
    // INSIDE putDocs (the production behavior — the put pays the 0.4 s
    // fold inline), leaving the explicitly-timed fold a no-op
    spark.conf.set("spark.graft.autoCompact.maxLag", "-1")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    nIdsList.foreach { nIds =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_cprobe_$nIds").toString
      val db = new XtDb(spark, root)
      def docs(lo: Long, hi: Long) = spark.range(lo, hi)
        .select(col("id").as("_id"),
          explode(sequence(lit(0), lit(versions - 1))).as("version"))
        .select(col("_id"), col("version"),
          (col("_id") * 31 + col("version")).as("v"))
      db.putDocs("ev", docs(1, nIds + 1))
      def asofAgg(): Long = Bitemporal.current(db.events("ev"))
        .agg(count(lit(1))).head().getLong(0)
      def bestOf(f: () => Long): (Long, Double) = {
        if (hotRuns > 1) f() // untimed warm
        val runs = (1 to math.max(1, hotRuns)).map(_ => time(f()))
        (runs.head._1, runs.map(_._2).min)
      }
      val (_, asofFlatNoBaseSec) = bestOf(() => asofAgg())
      val (_, fullSec) = time(db.compact("ev"))
      val (rows0, asofBucketedSec) = bestOf(() => asofAgg())
      // constant-size backlog, whatever the table size
      db.putDocs("ev", spark.range(nIds + 1, nIds + 1 + backlogRows)
        .select(col("id").as("_id"), lit(0).as("version"),
          (col("id") * 31).as("v")))
      val (_, asofFlatSec) = bestOf(() => asofAgg())
      val (folded, foldSec) = time(db.compactIncremental("ev"))
      val (rows1, asofAfterSec) = bestOf(() => asofAgg())
      // round-14: the ESCALATED full compact at unchanged fanout is a
      // bucket-aligned per-chunk merge — time it and prove zero shuffle
      val counters = EngineMetrics.install(spark)
      Thread.sleep(500) // drain in-flight listener events
      val shuffleBefore = counters.shuffleWriteBytes.get
      val (_, alignedFullSec) = time(db.compact("ev"))
      Thread.sleep(800) // listener bus is async
      val alignedShuffleBytes = counters.shuffleWriteBytes.get - shuffleBefore
      val (rows2, asofAlignedSec) = bestOf(() => asofAgg())
      val exchanges = graft.plans.Explain
        .report(db.asOf("ev")).shuffleExchanges
      val buckets = """"buckets":(\d+)""".r.findFirstMatchIn(
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths
          .get(s"$root/ev/_evmeta.json")), "UTF-8")).get.group(1).toInt
      println(
        s"""{"probe":"compaction","n_ids":$nIds,"versions":$versions,""" +
        s""""events":${nIds * versions},"backlog_rows":$backlogRows,""" +
        s""""hot_runs":$hotRuns,""" +
        s""""asof_flat_uncompacted_sec":${f"$asofFlatNoBaseSec%.3f"},""" +
        s""""full_compact_sec":${f"$fullSec%.3f"},""" +
        s""""fold_sec":${f"$foldSec%.3f"},"folded":$folded,""" +
        s""""buckets":$buckets,""" +
        s""""asof_bucketed_sec":${f"$asofBucketedSec%.3f"},""" +
        s""""asof_flat_backlog_sec":${f"$asofFlatSec%.3f"},""" +
        s""""asof_after_fold_sec":${f"$asofAfterSec%.3f"},""" +
        s""""asof_exchanges_after_fold":$exchanges,""" +
        s""""aligned_full_sec":${f"$alignedFullSec%.3f"},""" +
        s""""aligned_shuffle_bytes":$alignedShuffleBytes,""" +
        s""""asof_after_aligned_sec":${f"$asofAlignedSec%.3f"},""" +
        s""""rows_before":$rows0,"rows_after":$rows1,""" +
        s""""rows_after_aligned":$rows2}""")
      // clean up the multi-GB store before the next scale point
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(root))
    }
    spark.stop()
  }
}
