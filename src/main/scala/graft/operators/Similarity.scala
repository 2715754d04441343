package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.plans.VectorExprs

/** Approximate/exact nearest-neighbor search over an embedding column
  * (beyond-parity extension, SURVEY.md §7).
  *
  * Design for scale: queries are small (broadcast side); the corpus streams
  * through a single narrow pass. Per-query top-k is computed with a
  * partial-merge bounded-heap Aggregator — each map task reduces its
  * partition to <= k rows per query BEFORE the shuffle, so shuffle volume is
  * O(partitions * q * k), independent of corpus size. (A window row_number
  * would shuffle the full corpus x q score table instead.)
  */
object Similarity {

  case class Scored(id: Long, score: Double)

  /** Bounded top-k by (score desc, id asc) with partial merge — the
    * object-hash-aggregate path: update folds rows into a k-capped buffer
    * on each mapper, merge combines mapper buffers on the reducer.
    */
  class TopKAgg(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {
    private val ord: Ordering[Scored] =
      Ordering.by((s: Scored) => (-s.score, s.id))
    override def zero: List[Scored] = Nil
    private def trim(b: List[Scored]): List[Scored] = b.sorted(ord).take(k)
    override def reduce(b: List[Scored], a: Scored): List[Scored] = {
      val nb = a :: b
      if (nb.length > k * 4) trim(nb) else nb // amortize the sort
    }
    override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] = trim(b1 ::: b2)
    override def finish(b: List[Scored]): Seq[Scored] = trim(b)
    override def bufferEncoder: Encoder[List[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Column-level udaf for top-k. The Aggregator's input row (id, score) is
    * passed as two columns — Spark maps them positionally onto [[Scored]].
    */
  def topK(k: Int, id: Column, score: Column): Column = {
    implicit val inEnc: Encoder[Scored] = Encoders.product[Scored]
    udaf(new TopKAgg(k)).apply(id, score)
  }

  /** Exact brute-force cosine top-k: for each query vector, the k corpus
    * vectors with highest cosine (ties broken by ascending id).
    *
    * `queries` is broadcast (it is the small side by construction); the
    * corpus is scanned once; per-query top-k via the partial-merge
    * aggregator. Returns (query_id, neighbor_id, cosine, rank).
    */
  def bruteForceTopK(
      corpus: DataFrame, // columns (id, v)
      queries: DataFrame, // columns (id, v)
      k: Int = 10
  ): DataFrame = {
    val c = corpus.select(col("id").alias("c_id"), col("v").alias("c_v"))
    val q = queries.select(col("id").alias("q_id"), col("v").alias("q_v"))
    val scored = c
      .join(broadcast(q), col("c_id") =!= col("q_id"))
      .select(
        col("q_id"),
        col("c_id"),
        VectorExprs.cosine(col("q_v"), col("c_v")).alias("score")
      )
    explodeTopK(scored, k)
  }

  /** Shared tail: group scored pairs by query, bounded-heap top-k, explode
    * back to rows with 1-based rank.
    */
  def explodeTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("q_id"))
      .agg(topK(k, col("c_id"), col("score")).alias("nn"))
      .select(col("q_id"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(
        col("q_id").alias("query_id"),
        col("n.id").alias("neighbor_id"),
        col("n.score").alias("cosine"),
        (col("pos") + 1).alias("rank")
      )

  /** IVF-style ANN: corpus is pre-partitioned into `nlist` cells by nearest
    * centroid; a query probes only its `nprobe` closest cells. Centroids
    * here are chosen deterministically (first `nlist` corpus vectors by id —
    * a real deployment would k-means; the partition/probe plumbing is
    * identical). Recall < 1, cost ~ nprobe/nlist of brute force.
    *
    * At 100 TB the cell assignment is the expensive pass (one scan, then
    * write bucketed by cell); queries touch only matching cells — this is
    * the parquet-partition-pruning pattern applied to vector search.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      nlist: Int = 16,
      nprobe: Int = 4,
      k: Int = 10
  ): DataFrame = {
    val cents = corpus
      .select(col("id"), col("v"))
      .orderBy(col("id"))
      .limit(nlist)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Any](1).map(_.toString.toDouble).toArray) }
    val spark = corpus.sparkSession
    val centDf = spark.createDataFrame(cents.toSeq.map { case (i, v) => (i, v) }).toDF("cell", "cv")

    def assign(df: DataFrame, vcol: String, n: Int): DataFrame = {
      // score against every centroid (broadcast — nlist is tiny), keep top-n cells
      val scored = df
        .crossJoin(broadcast(centDf))
        .select(df.columns.map(col) :+ col("cell") :+ VectorExprs.cosine(col(vcol), col("cv")).alias("cscore"): _*)
      if (n == 1) {
        // argmax by (cscore desc, cell asc) as a hash aggregate: partial
        // map-side combine means the shuffle carries one row per id, not the
        // id x nlist scored table a window row_number would sort — this is
        // the corpus-side path, the one that sees 100% of the data.
        scored
          .groupBy(col("id"))
          .agg(
            max_by(col("cell"), struct(col("cscore"), -col("cell").cast("double"))).alias("cell"),
            first(col(vcol)).alias(vcol))
          .select(col("id"), col(vcol), col("cell"))
      } else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("id"))
          .orderBy(col("cscore").desc, col("cell"))
        scored.withColumn("crank", row_number().over(w)).filter(col("crank") <= n).drop("cv", "cscore", "crank")
      }
    }

    val cCells = assign(corpus.select(col("id"), col("v")), "v", 1)
      .select(col("id").alias("c_id"), col("v").alias("c_v"), col("cell"))
    val qCells = assign(queries.select(col("id"), col("v")), "v", nprobe)
      .select(col("id").alias("q_id"), col("v").alias("q_v"), col("cell"))

    val scored = cCells
      .join(broadcast(qCells), Seq("cell"))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"), VectorExprs.cosine(col("q_v"), col("c_v")).alias("score"))
    explodeTopK(scored, k)
  }
}
