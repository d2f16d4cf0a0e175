package graft.jobs

import org.apache.spark.sql.SparkSession

import graft.model._

/** CLI entry: run the demo crawl resumably into an Iceberg-style table.
  *
  * {{{
  * sbt "runMain graft.jobs.CrawlMain /tmp/crawl_table [runId] [strict]"
  * sbt "runMain graft.jobs.CrawlMain /tmp/crawl_table --compact"
  * sbt "runMain graft.jobs.CrawlMain /tmp/crawl_table --expire"
  * sbt "runMain graft.jobs.CrawlMain /tmp/crawl_table --invalidate <site> <year> <month>"
  * sbt "runMain graft.jobs.CrawlMain /tmp/crawl_table --rollback <version>"
  * }}}
  *
  * Maintenance commands use `--`-prefixed flags so a crawl runId can
  * never collide with a command name (a run literally named `compact`
  * must crawl, not compact).
  *
  * Running the crawl twice against the same table demonstrates
  * checkpointed resume: the second run's log is all `skipped` and the
  * table gains no rows. `compact`/`expire` are the table-maintenance
  * commands; `invalidate` re-opens one period for refetch (the
  * revised-data workflow).
  */
object CrawlMain {
  def main(args: Array[String]): Unit = {
    val tableDir = args.headOption.getOrElse("/tmp/graft_crawl_table")
    val runId = if (args.length > 1) args(1) else "run-1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // respect spark-submit's --master (e.g. a real multi-executor
    // cluster); default to local[cpus] when launched bare
    val master = sys.props.getOrElse("spark.master", s"local[$cpus]")
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-crawl")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    runId match {
      case "--compact" =>
        graft.table.TableIO.compact(spark, tableDir) match {
          case Some(s) => println(s"[crawl] compacted -> v${s.version} " +
            s"(${s.dataDirs.size} data dir, ${s.seenDirs.size} seen dir)")
          case None => println("[crawl] nothing to compact")
        }
        spark.stop(); return
      case "--expire" =>
        graft.table.TableIO.expire(tableDir)
        println(s"[crawl] expired superseded/orphaned dirs under $tableDir")
        spark.stop(); return
      case "--invalidate" if args.length >= 5 =>
        val period = (args(2), args(3).toInt, args(4).toInt)
        graft.table.TableIO.invalidatePeriods(spark, tableDir,
            Set(period)) match {
          case Some(s) =>
            println(s"[crawl] re-opened $period -> v${s.version}")
          case None => println("[crawl] empty table, nothing to invalidate")
        }
        spark.stop(); return
      case "--rollback" if args.length >= 3 &&
          args(2).toIntOption.isDefined =>
        graft.table.TableIO.rollback(spark, tableDir, args(2).toInt) match {
          case Some(s) =>
            println(s"[crawl] rolled back to v${args(2)} -> v${s.version} " +
              s"(rows=${s.totalRows})")
          case None => println("[crawl] already at that version (or empty table)")
        }
        spark.stop(); return
      // a mistyped or under-aritied flag must NOT fall through into a
      // crawl that commits runId "--invalidate" to the table
      case flag if flag.startsWith("--") =>
        System.err.println(s"[crawl] unknown or incomplete command " +
          s"'$flag' - expected --compact | --expire | " +
          "--invalidate <site> <year> <month> | --rollback <version>")
        spark.stop(); sys.exit(2)
      case _ => ()
    }

    // optional trailing args AFTER the runId position: "strict" =
    // per-host (not per-site-process) politeness domains; "cuckoo" =
    // persisted deletable seen sketch instead of the per-run bloom
    // rebuild. Only args(2..) are option words — a run literally
    // named "strict" or "cuckoo" stays an opaque runId (same
    // collision rule as the --maintenance commands above)
    val opts = args.drop(2).toSet
    val cfg = graft.queries.CrawlQueries.demoConfig.copy(
      strictPerHost = opts.contains("strict"),
      seenSketch = if (opts.contains("cuckoo")) "cuckoo" else "bloom")
    val (result, snap) = CrawlJob.runResumable(spark, cfg, tableDir, runId)
    import spark.implicits._
    val byStatus = result.log.groupByKey(_.status).count().collect()
      .sortBy(_._1).map { case (s, n) => s"$s=$n" }.mkString(" ")
    println(s"[crawl] run=$runId table=$tableDir version=${snap.version} " +
      s"rows=${snap.totalRows} partitions=${snap.partitions.size}")
    println(s"[crawl] log: $byStatus")
    CrawlJob.metrics(result.log, result.images).show(50, truncate = false)
    spark.stop()
  }
}
