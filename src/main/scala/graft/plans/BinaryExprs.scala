package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions over `BinaryType` payloads — the multimodal
  * feature extractors (SURVEY.md §7). These replace the former
  * `df.rdd.mapPartitions` hop in [[graft.operators.Multimodal]]: as plain
  * expressions they stay inside Catalyst (column pruning reaches the scan,
  * other columns survive, the plan stays whole-stage-codegen-eligible around
  * them), and they are per-row pure functions — exactly the shape
  * [[VectorExprs]] uses for vectors.
  *
  * Semantics are identical to `Multimodal.fakeDecode` (the deterministic
  * stand-in for a real codec; see the stub rationale there).
  */
object BinaryExprs {

  /** Shannon entropy (bits, log2) of the byte-value histogram of a binary
    * payload; 0.0 for an empty payload. Accumulates in byte-value order
    * (0..255) — deterministic across runs and executors.
    */
  case class ByteEntropy(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val n = bytes.length.toDouble
      if (n == 0) 0.0
      else {
        val hist = new Array[Long](256)
        var i = 0
        while (i < bytes.length) { hist(bytes(i) & 0xff) += 1; i += 1 }
        var ent = 0.0
        var v = 0
        while (v < 256) {
          if (hist(v) > 0) { val p = hist(v) / n; ent -= p * math.log(p) / math.log(2) }
          v += 1
        }
        ent
      }
    }
    override protected def withNewChildInternal(c: Expression): ByteEntropy = copy(child = c)
    override def prettyName: String = "byte_entropy"
  }

  /** 64-bit rolling hash of the first 16 bytes (h = h*31 + signed byte,
    * seed 1125899906842597 — wrapping Long arithmetic). A cheap content
    * prefix fingerprint: same codec header => same head hash.
    */
  case class HeadHash(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      var h = 1125899906842597L
      var i = 0
      val n = math.min(16, bytes.length)
      while (i < n) { h = h * 31 + bytes(i); i += 1 }
      h
    }
    override protected def withNewChildInternal(c: Expression): HeadHash = copy(child = c)
    override def prettyName: String = "head_hash"
  }

  /** Byte-bucket histogram "embedding": fraction of bytes in each of
    * `buckets` equal-width byte-value ranges, as `array<float>` of length
    * `buckets`. All-zero for an empty payload. Counts accumulate exactly in
    * a Long histogram (a Float accumulator would silently saturate at 2^24
    * bytes per bucket), then divide by total length as Double and narrow to
    * Float — the `fakeDecode` semantics, bit for bit.
    */
  case class ByteBucketHist(child: Expression, buckets: Int)
      extends UnaryExpression with CodegenFallback {
    require(buckets > 0 && 256 % buckets == 0, s"buckets=$buckets must divide 256")
    override def dataType: DataType = ArrayType(FloatType, containsNull = false)
    private val width = 256 / buckets
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val hist = new Array[Long](buckets)
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xff) / width) += 1L; i += 1 }
      val vec = new Array[Float](buckets)
      val n = bytes.length.toDouble
      if (n > 0) { var j = 0; while (j < buckets) { vec(j) = (hist(j) / n).toFloat; j += 1 } }
      ArrayData.toArrayData(vec)
    }
    override protected def withNewChildInternal(c: Expression): ByteBucketHist = copy(child = c)
    override def prettyName: String = "byte_bucket_hist"
  }

  // --- Column wrappers (Spark 4.x Column<->Expression via the graft Bridge) --

  import org.apache.spark.sql.graft.Bridge.{column => asCol, expression => asExpr}

  def byteEntropy(c: Column): Column = asCol(ByteEntropy(asExpr(c)))
  def headHash(c: Column): Column = asCol(HeadHash(asExpr(c)))
  def byteBucketHist(c: Column, buckets: Int = 8): Column =
    asCol(ByteBucketHist(asExpr(c), buckets))

  /** SQL-name → builder table (see [[VectorExprs.sqlFunctions]]). */
  val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "byte_entropy" -> (es => ByteEntropy(es.head)),
    "head_hash" -> (es => HeadHash(es.head)))

  /** SQL-name registration (same pattern as [[VectorExprs.register]]). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    sqlFunctions.foreach { case (n, b) =>
      reg.createOrReplaceTempFunction(n, b, "built-in")
    }
  }
}
