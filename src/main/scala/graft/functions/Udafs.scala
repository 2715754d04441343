package graft.functions

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

import graft.operators.Similarity

/** User-facing AGGREGATE functions (SURVEY.md §2.5's deferred extension
  * tier): the typed partial-merge `Aggregator`s the engine already uses
  * internally, registered as SQL-callable UDAFs.
  *
  * Packaging note: `SparkSessionExtensions.injectFunction` covers scalar
  * expression builders only ([[graft.GraftExtensions]] uses it for the
  * vector/text/binary functions); Spark's packaging for Aggregator-backed
  * aggregates is `functions.udaf` + `spark.udf.register` on the session —
  * [[graft.Engine.create]] calls [[register]] so every graft session has
  * them, and any foreign session gets them with one `Udafs.register(spark)`.
  *
  * Both UDAFs keep the engine's scale posture: partial-merge `Aggregator`s
  * run as map-side combining object-hash aggregates — each mapper reduces
  * its partition to one bounded buffer per group BEFORE the shuffle
  * (a k-capped heap; six decimal co-moments), so shuffle volume is
  * O(groups), independent of row count.
  */
object Udafs {

  /** Decimal-exact Pearson correlation — the UDAF form of
    * `corrStats` (`Relational.scala`): terms are rounded to DECIMAL(…,6)
    * exactly like Spark's `Cast(double→decimal)` (`BigDecimal(x)` is the
    * shortest-representation constructor Spark's `Decimal(Double)` uses,
    * `HALF_UP` its changePrecision mode), then summed EXACTLY — the sums
    * are order-independent, so the result hash-matches across partition
    * counts and engines, which Spark's streaming `corr` aggregate (float
    * accumulation) never does. The final corr is one fixed IEEE op
    * sequence over the exact co-moments.
    */
  case class XY(x: Double, y: Double)
  case class CorrBuf(n: Long, sx: BigDecimal, sy: BigDecimal,
      sxy: BigDecimal, sxx: BigDecimal, syy: BigDecimal)

  class CorrExactAgg extends Aggregator[XY, CorrBuf, Option[Double]] {
    private def dec6(v: Double): BigDecimal =
      BigDecimal(v).setScale(6, RoundingMode.HALF_UP)
    private val z = BigDecimal(0).setScale(6)
    override def zero: CorrBuf = CorrBuf(0L, z, z, z, z, z)
    override def reduce(b: CorrBuf, a: XY): CorrBuf =
      // products computed in double first (the same IEEE multiply the SQL
      // oracle's CAST(x*y AS DECIMAL) applies), then rounded and summed
      CorrBuf(b.n + 1, b.sx + dec6(a.x), b.sy + dec6(a.y),
        b.sxy + dec6(a.x * a.y), b.sxx + dec6(a.x * a.x), b.syy + dec6(a.y * a.y))
    override def merge(a: CorrBuf, b: CorrBuf): CorrBuf =
      CorrBuf(a.n + b.n, a.sx + b.sx, a.sy + b.sy,
        a.sxy + b.sxy, a.sxx + b.sxx, a.syy + b.syy)
    override def finish(b: CorrBuf): Option[Double] = {
      val nd = b.n.toDouble
      val sx = b.sx.toDouble; val sy = b.sy.toDouble
      val vx = nd * b.sxx.toDouble - sx * sx
      val vy = nd * b.syy.toDouble - sy * sy
      if (vx > 0 && vy > 0)
        Some((nd * b.sxy.toDouble - sx * sy) / (math.sqrt(vx) * math.sqrt(vy)))
      else None
    }
    override def bufferEncoder: Encoder[CorrBuf] = ExpressionEncoder[CorrBuf]()
    override def outputEncoder: Encoder[Option[Double]] = ExpressionEncoder[Option[Double]]()
  }

  /** Register every graft UDAF on the session (idempotent — re-registering
    * replaces the same names):
    *
    *  - `graft_top3(id BIGINT, score DOUBLE)` → `array<struct<id, score>>`,
    *    the bounded top-k heap ([[Similarity.TopKAgg]]) ordered
    *    (score DESC, id ASC);
    *  - `graft_corr_exact(x DOUBLE, y DOUBLE)` → `DOUBLE`, decimal-exact
    *    Pearson correlation (NULL when either variance is zero).
    */
  def register(s: SparkSession): Unit = {
    implicit val scoredEnc: Encoder[Similarity.Scored] =
      Encoders.product[Similarity.Scored]
    implicit val xyEnc: Encoder[XY] = Encoders.product[XY]
    s.udf.register("graft_top3", functions.udaf(new Similarity.TopKAgg(3)))
    s.udf.register("graft_corr_exact", functions.udaf(new CorrExactAgg))
  }
}
