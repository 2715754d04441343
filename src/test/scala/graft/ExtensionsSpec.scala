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
  }
}
