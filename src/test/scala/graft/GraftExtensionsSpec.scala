package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions installs kernels at session build time") {
    // Force the shared context to exist, then build a SEPARATE session
    // (same SparkContext) with the extensions config — the way a user
    // deploys the library on a cluster.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .getOrCreate()
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
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
