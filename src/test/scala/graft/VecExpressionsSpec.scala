package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VecExpressions
import graft.ops.AnnOps

/** The native float-vector dot expression must agree bit-for-bit with
  * the pure-Scala kernel, stay inside whole-stage codegen (the whole
  * point — higher-order zip_with/aggregate are CodegenFallback), and
  * reject wrong types/arity at analysis. */
class VecExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("vec_dot equals AnnOps.dot bit-for-bit on real embeddings; null-safe") {
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val pairs = e.take(10).flatMap(a => e.take(10).map(b => (a, b)))
    val df = pairs.toSeq
      .map { case ((ia, va), (ib, vb)) => (ia, ib, va, vb) }
      .toDF("ia", "ib", "va", "vb")
      .withColumn("d", VecExpressions.vec_dot(col("va"), col("vb")))
      .withColumn("n", VecExpressions.vec_norm(col("va")))
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4), r.getDouble(5)))
    val byId = e.toMap
    got.foreach { case (ia, ib, d, n) =>
      assert(d === AnnOps.dot(byId(ia), byId(ib)), s"dot($ia,$ib)")
      assert(n === AnnOps.norm(byId(ia)), s"norm($ia)")
    }
    // null input -> null output (nullIntolerant)
    val withNull = Seq((Array(1.0f, 2.0f), null: Array[Float]))
      .toDF("a", "b")
      .select(VecExpressions.vec_dot(col("a"), col("b")).as("d"))
    assert(withNull.collect()(0).isNullAt(0))
  }

  test("stays in WholeStageCodegen over a parquet scan; not a ScalaUDF") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(VecExpressions.vec_dot(col("embedding"), col("embedding"))
        .as("selfdot"))
    assert(df.collect().forall(r => r.getDouble(0) >= 0.0))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("vec_dot_f32") && l.trim.startsWith("*(")),
      s"vec_dot_f32 fell out of codegen:\n$plan")
    assert(!plan.contains("ScalaUDF"))
  }

  test("SQL surface via GraftExtensions; type and arity checked") {
    val sc = spark.sparkContext
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master(sc.master)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT vec_dot_f32(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT))," +
          " array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d")
        .collect()(0)
      assert(r.getDouble(0) === 4.0)
      val arity = intercept[Exception] {
        s2.sql("SELECT vec_dot_f32(array(CAST(1.0 AS FLOAT)))").collect()
      }
      assert(arity.getMessage.contains("vec_dot_f32"), arity.getMessage)
      val types = intercept[Exception] {
        s2.sql("SELECT vec_dot_f32(array(1, 2), array(3, 4))").collect()
      }
      assert(types.getMessage.toLowerCase.contains("array<float>") ||
        types.getMessage.contains("DATATYPE_MISMATCH"), types.getMessage)
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
    }
  }
}
