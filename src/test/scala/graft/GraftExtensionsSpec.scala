package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions installs kernels at session build time") {
    // Spark reads spark.sql.extensions from the SPARKCONTEXT conf when a
    // session is built (Builder.getOrCreate → applyExtensions), exactly
    // where spark-submit --conf puts it. Builder options do NOT attach
    // extensions to a pre-existing context — so plant the conf on the
    // shared context (tests share one JVM-wide SparkContext), then build.
    // Forcing the shared SparkSpec.session (the ONLY getOrCreate in the
    // test tree) to initialize BEFORE the conf mutation below means no
    // concurrently-running suite can build a session inside the window
    // and silently inherit the extensions.
    val sc = spark.sparkContext
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    val scConf = org.apache.spark.GraftTestBridge.contextConf(sc)
    scConf.set("spark.sql.extensions", "graft.GraftExtensions")
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // Suites run in parallel in this JVM: another suite can publish its
      // session between our clear and getOrCreate, making getOrCreate
      // return a session built WITHOUT the extensions. Bounded retry —
      // only a session that really ran the extensions has the kernels.
      def fresh(attempts: Int): SparkSession = {
        val s = SparkSession.builder().getOrCreate()
        if (s.sessionState.functionRegistry.functionExists(
            org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"))) s
        else if (attempts <= 0) fail("could not obtain an extensions session")
        else {
          SparkSession.clearDefaultSession()
          SparkSession.clearActiveSession()
          fresh(attempts - 1)
        }
      }
      val s2 = fresh(50)
      val r = s2.sql(
        "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) c, " +
          "jaccard_sim(array('a','b'), array('b','c')) j, " +
          "simhash64(array('x','y')) h").collect()(0)
      assert(r.getDouble(0) == 1.0)
      assert(math.abs(r.getDouble(1) - 1.0 / 3.0) < 1e-15)
      assert(r.get(2).isInstanceOf[Long])
      // Child sessions inherit the injected functions (no re-install).
      val child = s2.newSession()
      assert(child.sql("SELECT cosine_sim(array(1.0d), array(1.0d)) c").collect()(0).getDouble(0) == 1.0)
      // The BigQuery dialect surface ships with the extension, including
      // bare unit identifiers handled by the injected BQUnitArgRule.
      val bq = s2.sql(
        "SELECT TIMESTAMP_DIFF(TIMESTAMP '2024-01-02 03:00:00', TIMESTAMP '2024-01-01 00:00:00', HOUR) h, " +
          "DATE_DIFF(DATE '2024-03-01', DATE '2024-01-31', MONTH) m, " +
          "DATE_TRUNC(DATE '2024-06-15', MONTH) t, " +
          "SAFE_DIVIDE(1, 0) sd").collect()(0)
      assert(bq.getLong(0) == 27L)
      assert(bq.getLong(1) == 2L)
      assert(bq.getDate(2).toString == "2024-06-01")
      assert(bq.isNullAt(3))
      // A column really named `day` is untouched by the unit rewrite
      // (rule is scoped to unit-position args of the unit functions).
      val col = s2.sql("SELECT day FROM VALUES (7) t(day)").collect()(0)
      assert(col.getInt(0) == 7)
      // …including in a DATA argument position of a unit function: only
      // the unit position (last for *_DIFF, second for *_TRUNC) is
      // rewritten, so TIMESTAMP_DIFF(day, ts, HOUR) reads the column.
      val dataArg = s2.sql(
        "SELECT TIMESTAMP_DIFF(day, TIMESTAMP '2024-01-01 00:00:00', HOUR) h " +
          "FROM VALUES (TIMESTAMP '2024-01-01 05:30:00') t(day)").collect()(0)
      assert(dataArg.getLong(0) == 5L)
    } finally {
      scConf.remove("spark.sql.extensions")
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
