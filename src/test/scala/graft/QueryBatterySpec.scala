package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Smoke + determinism checks for every SparkEntry query at sf0.001.
  * Exact value correctness vs DuckDB is the driver's gate (and
  * tools/check_oracle.py locally); here we assert shape invariants that
  * must hold regardless of SF or parallelism. */
class QueryBatterySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs, is non-empty, and is partitioning-invariant") {
      val df = fn(spark, sf)
      val n = df.count()
      assert(n > 0, s"$name returned 0 rows at sf0.001")
      // rerun under a different shuffle-partition setting: row count and
      // a column-order-insensitive checksum must be identical
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        val df2 = fn(spark, sf)
        assert(df2.count() === n, s"$name row count changed with partitions")
        val cols = df.columns.sorted.toSeq
        def sig(d: org.apache.spark.sql.DataFrame): Long = {
          import org.apache.spark.sql.functions._
          d.select(xxhash64(cols.map(c => col(c).cast("string")): _*)
            .as("h")).agg(expr("bit_xor(h)")).collect()(0).getLong(0)
        }
        assert(sig(df2) === sig(fn(spark, sf)),
          s"$name results changed with partitions")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
