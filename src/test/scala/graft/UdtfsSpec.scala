package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Udtfs

/** UDTF (generator) surface — functions/Udtfs.scala: SQL LATERAL VIEW,
  * generator-in-select, empty expansion, and null-argument behavior.
  */
class UdtfsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("i", LongType), StructField("s", StringType)))

  private def indexer = Udtfs.defineUdtf(spark, "t_indexed", schema, args => {
    val xs = Option(args.head).map(_.asInstanceOf[Seq[_]]).getOrElse(Seq.empty)
    xs.iterator.zipWithIndex.map { case (x, i) => Seq(i.toLong, String.valueOf(x)) }
  }, arity = 1)

  test("SQL LATERAL VIEW expands one row into N with the declared schema") {
    indexer
    Seq((1L, Seq("a", "b")), (2L, Seq("c")), (3L, Seq.empty[String]))
      .toDF("id", "xs").createOrReplaceTempView("udtf_in")
    val out = spark.sql(
      "SELECT id, t.i, t.s FROM udtf_in LATERAL VIEW t_indexed(xs) t AS i, s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // id=3 (empty array) emits nothing — generators drop, not null-pad
    assert(out == Set((1L, 0L, "a"), (1L, 1L, "b"), (2L, 0L, "c")))
  }

  test("OUTER LATERAL VIEW null-pads rows the generator drops") {
    indexer
    Seq((1L, Seq("a")), (2L, Seq.empty[String])).toDF("id", "xs")
      .createOrReplaceTempView("udtf_outer_in")
    val out = spark.sql(
      "SELECT id, t.i FROM udtf_outer_in LATERAL VIEW OUTER t_indexed(xs) t AS i, s")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(out == Set((1L, 0L), (2L, -1L)))
  }

  test("Column-side call plans a Generate node with elementSchema names") {
    val g = indexer
    val df = Seq((7L, Seq("x", "y"))).toDF("id", "xs")
      .select(col("id"), g(col("xs")))
    assert(df.columns.toSeq == Seq("id", "i", "s"))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet ==
      Set((7L, 0L, "x"), (7L, 1L, "y")))
  }

  test("scale shape: UDTF plans as Generate with no exchange") {
    val g = indexer
    val plan = Seq((1L, Seq("a"))).toDF("id", "xs")
      .select(col("id"), g(col("xs")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), s"expected GenerateExec in:\n$plan")
    assert(!plan.contains("Exchange"), s"a row-local generator must not shuffle:\n$plan")
  }

  test("null argument expands to nothing (no NPE)") {
    indexer
    val df = Seq(Tuple1(1L)).toDF("id").withColumn("xs",
      lit(null).cast("array<string>"))
    df.createOrReplaceTempView("udtf_null_in")
    assert(spark.sql(
      "SELECT t.i FROM udtf_null_in LATERAL VIEW t_indexed(xs) t AS i, s").count() == 0L)
  }

  test("UDTF composes into a SQL CREATE FUNCTION ... RETURNS TABLE wrapper") {
    indexer
    Seq((1L, Seq("a", "bb", "ccc")), (2L, Seq("dd"))).toDF("id", "xs")
      .createOrReplaceTempView("udtf_wrap_in")
    // parameterized SQL table function over the Scala-closure generator:
    // callers see a catalog object, not a closure
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION udtf_wrap(minI BIGINT)
         RETURNS TABLE (id BIGINT, s STRING)
         RETURN SELECT w.id, t.s FROM udtf_wrap_in w
           LATERAL VIEW t_indexed(w.xs) t AS i, s
           WHERE t.i >= minI""")
    val out = spark.sql("SELECT id, s FROM udtf_wrap(1) ORDER BY id, s")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "bb"), (1L, "ccc"))) // i>=1 drops each row's head
  }

  test("wrong arity fails at analysis, not mid-task") {
    indexer
    Seq((1L, Seq("a"))).toDF("id", "xs").createOrReplaceTempView("udtf_ar_in")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT t.i FROM udtf_ar_in LATERAL VIEW t_indexed(xs, id) t AS i, s")
        .collect()
    }
    assert(e.getMessage.contains("expects 1 argument"),
      s"expected the arity message, got: ${e.getMessage}")
  }
}
