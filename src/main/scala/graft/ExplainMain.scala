package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the formatted physical plan of one
  * SparkEntry query — `runMain graft.ExplainMain <name> [sfDir]`.
  * Used to keep the plans honest (pushed filters, broadcasts,
  * whole-stage codegen spans) as the battery grows. */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(sys.props.getOrElse("spark.master", "local[8]"))
      .appName(s"graft-explain-$name")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    println(s"=== $name ===")
    df.explain("formatted")
    spark.stop()
  }
}
