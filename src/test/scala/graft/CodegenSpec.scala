package graft

import org.apache.spark.sql.functions._
import graft.plans.{TextExprs, VectorExprs}

/** Pins that the hot custom expressions really generate code — a janino
  * error would silently fall back to interpreted eval with no test failing,
  * so we grep the generated source for the kernel calls.
  */
class CodegenSpec extends SparkSpec {
  import spark.implicits._

  private def genCode(df: org.apache.spark.sql.DataFrame): String =
    org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)

  test("CosineSim compiles into whole-stage codegen (the measured winner)") {
    // spark.range sources: a local Seq would be constant-folded into a
    // LocalTableScan before any codegen stage exists.
    // Only CosineSim keeps doGenCode: the A/B measurement (6 interleaved
    // runs at sf0.1) showed +17% on q37 for codegen'd cosine but no win
    // (a wash) on q33/q34 for codegen'd ShingleHashes/MinHashBuckets, so
    // those stay CodegenFallback (rationale in their Scaladoc).
    val vdf = spark.range(8).select(
      array($"id".cast("float"), lit(1.0f)).as("a"),
      array(lit(2.0f), $"id".cast("float")).as("b"))
    val cos = genCode(vdf.select(VectorExprs.cosine($"a", $"b")))
    assert(cos.contains("Kernels.cosine"), s"cosine not codegen'd:\n${cos.take(1500)}")

    // the fallback pair must still evaluate correctly inside a codegen stage
    val tdf = spark.range(4).select(concat(lit("a b c d "), $"id".cast("string")).as("t"))
    assert(tdf.select(TextExprs.shingleHashes($"t", 3).as("sh")).collect().length == 4)
    val hdf = spark.range(4).select(array($"id", $"id" + 1L).as("h"))
    assert(hdf.select(VectorExprs.minhashBuckets($"h", 8, 4).as("mb")).collect().length == 4)
  }

  test("generated and interpreted paths agree") {
    val text = "the quick brown fox jumps over the lazy dog the quick brown"
    val df = Seq(Tuple1(text)).toDF("t")
    val viaPlan = df.select(TextExprs.shingleHashes($"t", 3).as("sh"))
      .collect()(0).getSeq[Long](0)
    val viaEval = graft.plans.Kernels
      .shingleHashes(org.apache.spark.unsafe.types.UTF8String.fromString(text), 3)
      .toLongArray().toSeq
    assert(viaPlan == viaEval)
  }
}
