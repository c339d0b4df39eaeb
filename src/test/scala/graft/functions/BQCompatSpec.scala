package graft.functions

import graft.SparkSpec

class BQCompatSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    BQCompat.install(spark)
  }

  test("REGEXP_CONTAINS behaves like the BigQuery function") {
    val r = spark.sql("SELECT REGEXP_CONTAINS('hello123', '[0-9]+') a, REGEXP_CONTAINS('hello', '[0-9]+') b").collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }

  test("SAFE_DIVIDE returns NULL on zero divisor") {
    val r = spark.sql("SELECT SAFE_DIVIDE(10, 4) a, SAFE_DIVIDE(1, 0) b").collect()(0)
    assert(r.getDouble(0) == 2.5)
    assert(r.isNullAt(1))
  }

  test("FORMAT_DATE with BigQuery %-patterns") {
    val r = spark.sql("SELECT FORMAT_DATE('%Y-%m-%d', DATE '2024-06-15') d").collect()(0)
    assert(r.getString(0) == "2024-06-15")
  }

  test("PARSE_DATE with BigQuery %-patterns") {
    val r = spark.sql("SELECT PARSE_DATE('%Y-%m-%d', '2024-01-25') d").collect()(0)
    assert(r.getDate(0).toString == "2024-01-25")
  }

  test("FARM_FINGERPRINT is deterministic and spreads") {
    val r = spark.sql("SELECT FARM_FINGERPRINT('abc') a, FARM_FINGERPRINT('abc') b, FARM_FINGERPRINT('abd') c").collect()(0)
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) != r.getLong(2))
  }

  test("compat functions stay codegen-native (no UDF nodes in plan)") {
    val plan = spark.sql("SELECT SAFE_DIVIDE(x, 2) FROM VALUES (4.0) t(x)")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.toLowerCase.contains("scalaudf"))
  }
}
