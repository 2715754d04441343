package graft

import org.apache.spark.sql.SparkSession

/** [[GraftExtensions]] — the `spark.sql.extensions` entry point. The
  * injection test builds a genuinely NEW session (active/default cleared so
  * getOrCreate cannot return the shared one; the SparkContext is reused)
  * and calls the functions from pure SQL with no register() call.
  */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects every graft SQL function into a fresh session") {
    val shared = spark
    // spark.sql.extensions is STATIC conf read from the SparkContext at
    // session build — unreachable for a reused test context, so go through
    // the builder's official withExtensions hook: the same
    // SparkSessionExtensions => Unit apply() Spark would call after
    // class-loading the config string
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne shared)
      val r = s2.sql(
        """SELECT
             cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                        array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
             token_count('  a b   c ') AS n,
             lang_id('the cat and the dog is that it was with for the') AS l,
             byte_entropy(encode('aaaa', 'UTF-8')) AS e
        """).collect()(0)
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(r.getInt(1) == 3)
      assert(r.getString(2) == "en")
      assert(r.getDouble(3) == 0.0)   // constant bytes => zero entropy
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("extension table and per-session register() expose the same names") {
    val fromModules = (graft.plans.VectorExprs.sqlFunctions ++
      graft.plans.BinaryExprs.sqlFunctions ++
      graft.plans.TextExprs.sqlFunctions).map(_._1).toSet
    assert(GraftExtensions.all.map(_._1).toSet == fromModules)
    assert(GraftExtensions.all.size == fromModules.size)   // no duplicates
    // and the shared session's register() path resolves one of each family
    graft.plans.VectorExprs.register(spark)
    graft.plans.TextExprs.register(spark)
    graft.plans.BinaryExprs.register(spark)
    val out = spark.sql(
      "SELECT l2_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))), quality_score('x'), head_hash(encode('x', 'UTF-8'))")
      .collect()(0)
    assert(math.abs(out.getDouble(0) - 5.0) < 1e-12)
    // the portable value hash resolves from SQL and matches the expression
    val h = spark.sql("SELECT fnv64('abc')").collect()(0).getLong(0)
    assert(h == graft.plans.TextExprs.fnv1a64("abc"))
  }

  test("Udafs.register exposes the aggregate surface through plain SQL") {
    graft.functions.Udafs.register(spark)
    import spark.implicits._
    Seq((1L, 10.0, 1.0), (2L, 30.0, 3.0), (3L, 20.0, 2.0), (4L, 30.0, 5.0))
      .toDF("id", "score", "y").createOrReplaceTempView("udaf_t")
    // top-3 by (score DESC, id ASC): 30@2, 30@4, 20@3
    val top = spark.sql(
      "SELECT graft_top3(id, score) AS t FROM udaf_t").collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
    assert(top.map(r => (r.getLong(0), r.getDouble(1))) ==
      Seq((2L, 30.0), (4L, 30.0), (3L, 20.0)))
    // decimal-exact corr matches the closed form on a known sample
    val corr = spark.sql(
      "SELECT graft_corr_exact(score, y) AS c FROM udaf_t").collect()(0).getDouble(0)
    val (xs, ys) = (Seq(10.0, 30.0, 20.0, 30.0), Seq(1.0, 3.0, 2.0, 5.0))
    val n = 4.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val (sxx, syy) = (xs.map(a => a * a).sum, ys.map(a => a * a).sum)
    val expect = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(corr - expect) < 1e-12)
    // zero variance => NULL, not NaN
    assert(spark.sql("SELECT graft_corr_exact(1.0, y) FROM udaf_t").collect()(0).isNullAt(0))
    // partial-merge discipline: same answer regardless of partitioning
    val repart = spark.sql("SELECT graft_corr_exact(score, y) AS c FROM udaf_t").collect()(0).getDouble(0)
    spark.table("udaf_t").repartition(7).createOrReplaceTempView("udaf_t7")
    val corr7 = spark.sql("SELECT graft_corr_exact(score, y) AS c FROM udaf_t7").collect()(0).getDouble(0)
    assert(corr7 == repart) // bit-identical, not approximately equal
  }
}
