package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the operator batteries:
  *  - [[graft.queries.RelationalQueries]] — joins/aggs/windows/set-ops
  *  - [[graft.queries.TextQueries]] — dedup/token/quality/embedding ops
  *  - crawl-native queries (frontier, dedup, politeness, seen-set) are
  *    registered from [[graft.queries.CrawlQueries]] (oracle-free where
  *    not SQL-expressible).
  */
object SparkEntry {
  /** Flagship: the end-to-end crawl slice (SURVEY §7.3) — ordered
    * crawl log of the demo config over the deterministic synthetic
    * web. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("crawl_log")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.CrawlQueries.queries ++
      graft.queries.OpsQueries.queries ++
      graft.queries.ReportQueries.queries ++
      graft.queries.FrontierQueries.queries ++
      graft.queries.JsonQueries.queries ++
      graft.queries.CsvQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracleSql ++
      graft.queries.TextQueries.oracleSql ++
      graft.queries.ReportQueries.oracleSql ++
      graft.queries.FrontierQueries.oracleSql ++
      graft.queries.JsonQueries.oracleSql ++
      graft.queries.CsvQueries.oracleSql ++
      graft.queries.OpsQueries.oracleSql ++
      graft.queries.CrawlQueries.oracleSql
}
