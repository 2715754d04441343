package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.operators.Relational.GraftOps

/** Algebraic laws the reference surface implies (SURVEY.md §5.4), checked
  * over generated frames with plain ScalaCheck (sbt runs Properties
  * natively). Generators stay small — each property round-trips a Spark
  * job, so the value is in the shrunk counterexamples, not volume.
  */
object RelationalProps extends Properties("relational") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withMaxSize(12)

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-props")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val rowsGen: Gen[List[(Int, Int)]] =
    Gen.listOf(Gen.zip(Gen.choose(-5, 5), Gen.choose(-5, 5)))

  private def mk(rows: List[(Int, Int)]): DataFrame =
    spark.createDataFrame(rows).toDF("a", "b")

  private def rowSet(df: DataFrame): Set[(Int, Int)] =
    df.collect().map(x => (x.getInt(0), x.getInt(1))).toSet

  property("filter commutes with select of disjoint columns") = forAll(rowsGen) { rows =>
    val df = mk(rows)
    val l = df.filterCol(col("a") > 0).selectCols(Seq(col("b"))).collect().map(_.getInt(0)).sorted.toSeq
    val r = df.selectCols(Seq(col("a"), col("b"))).filterCol(col("a") > 0)
      .selectCols(Seq(col("b"))).collect().map(_.getInt(0)).sorted.toSeq
    l == r
  }

  property("union count = sum; union is positional") = forAll(rowsGen, rowsGen) { (xs, ys) =>
    val l = mk(xs); val r = mk(ys)
    val countOk = l.unionAll(r).count() == xs.length.toLong + ys.length.toLong
    // positional: right's columns renamed crosswise still glue by position
    val swapped = r.selectCols(Seq(col("a").as("b"), col("b").as("a")))
    val glued = rowSet(l.unionAll(swapped))
    countOk && glued == (xs ++ ys).toSet
  }

  property("distinct of union = union-distinct") = forAll(rowsGen, rowsGen) { (xs, ys) =>
    rowSet(mk(xs).unionAll(mk(ys)).distinct()) == rowSet(mk(xs).unionDistinct(mk(ys)))
  }

  property("intersect ⊆ both inputs; except ⊆ left, disjoint from right") =
    forAll(rowsGen, rowsGen) { (xs, ys) =>
      val inter = rowSet(mk(xs).intersectDistinct(mk(ys)))
      val ex = rowSet(mk(xs).exceptDistinct(mk(ys)))
      inter.subsetOf(xs.toSet) && inter.subsetOf(ys.toSet) &&
        ex.subsetOf(xs.toSet) && ex.intersect(ys.toSet).isEmpty
    }

  property("limit(skip, fetch) after total sort slices the sorted sequence") =
    forAll(rowsGen, Gen.choose(0, 8), Gen.choose(0, 8)) { (xs, skip, fetch) =>
      val sortedAll = mk(xs).sortBy(Seq(col("a"), col("b")))
        .collect().map(x => (x.getInt(0), x.getInt(1))).toSeq
      val sliced = mk(xs).sortBy(Seq(col("a"), col("b"))).limitOffset(skip, Some(fetch))
        .collect().map(x => (x.getInt(0), x.getInt(1))).toSeq
      sliced == sortedAll.slice(skip, skip + fetch)
    }

  property("distinctOn emits the first row per key under the given order") =
    forAll(rowsGen) { rows =>
      rows.nonEmpty ==> {
        val out = mk(rows)
          .distinctOn(Seq(col("a")), Seq(col("a"), col("b")), Seq(col("b").asc, col("a").asc))
          .collect().map(x => (x.getInt(0), x.getInt(1)))
        val minB = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
        (out.map(_._1).toSeq.sorted == rows.map(_._1).distinct.sorted) :| "one row per key" &&
          out.forall { case (a, b) => minB(a) == b } :| "row is the order-first of its group"
      }
    }

  property("analyzed fails fast on unknown columns (reference error timing)") = Prop {
    try { mk(List((1, 2))).selectCols(Seq(col("nope"))).analyzed; false }
    catch { case _: org.apache.spark.sql.AnalysisException => true }
  }
}
