package graft.tmp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val execs = args.headOption.getOrElse("4").toInt
    val n = args.lift(1).getOrElse("300000").toLong
    val spark = SparkSession.builder()
      .master(s"local-cluster[$execs,2,4096]")
      .appName(s"dedup-probe-$execs")
      .config("spark.executor.memory", "3g")
      .config("spark.executor.extraClassPath",
        new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      .config("spark.sql.shuffle.partitions", (execs * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.scheduler.minRegisteredResourcesRatio", "1.0")
      .config("spark.eventLog.enabled", "true").config("spark.eventLog.dir", "/tmp/spark-events").config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val textUdf = udf { (id: Long) =>
      val base = if (id >= n * 9 / 10) id % math.max(n / 10, 1L) else id
      val sb = new StringBuilder(1100)
      var j = 0
      while (j < 60) {
        sb.append(java.lang.Long.toHexString(
          graft.url.Hashing.mix(base * 131L + j, 0x5EED2L))).append(' ')
        j += 1
      }
      if (id != base) sb.append("copia")
      sb.toString
    }
    val docs = spark.range(0L, n, 1L, execs * 4).select($"id", textUdf($"id").as("text"))
    // small warmup for JIT
    spark.range(0L, 2000L, 1L, execs * 4).select($"id", textUdf($"id").as("text"))
      .select(count(length($"text"))).collect()
    val t0 = System.nanoTime()
    val pairs = graft.ops.DedupOps.minhashPairs(docs, "id", "text", threshold = 0.5).count()
    println(f"[probe] execs=$execs n=$n pairs=$pairs sec=${(System.nanoTime()-t0)/1e9}%.1f app=${spark.sparkContext.applicationId}")
    spark.stop()
  }
}
