package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses the bench metric from the LAST 2000 characters of
  * sbt output — this line failed to parse in two consecutive rounds
  * (log-prefix, then length). Lock the invariants down.
  */
class BenchLineSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"

  private def queries(n: Int): Map[String, Double] =
    (1 to n).map(i => f"q_generated_operator_name_$i%03d" -> i * 0.013).toMap

  test("short line stays under 1500 chars even with hundreds of queries") {
    for (n <- Seq(0, 1, 40, 41, 106, 300)) {
      val line = Bench.shortLine(queries(n), sf)
      assert(line.length <= 1500, s"n=$n line length ${line.length}")
    }
  }

  test("short line is valid JSON with the contract fields") {
    // No JSON lib on the test classpath — drive the same check the
    // driver does through the JDK's Nashorn-free built-in: a strict
    // structural regex plus balanced-brace sanity.
    val line = Bench.shortLine(queries(106), sf)
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.endsWith(s""","sf":"$sf"}"""))
    assert(line.contains(""""unit":"sec""""))
    assert(line.contains(""""queries":{"""))
    assert(line.count(_ == '{') == 2 && line.count(_ == '}') == 2)
    // Values render as plain decimals (no NaN/Infinity/exponent forms
    // that would break json.loads).
    assert(!line.contains("NaN") && !line.contains("Infinity") && !line.toLowerCase.contains("e+"))
    // Large inventories fold the tail into _other_total and total is
    // preserved across the fold (3dp rounding per entry).
    assert(line.contains("_other_total"))
    val total = queries(106).values.sum
    assert(line.contains(s""""value":${f"$total%.3f"}"""))
  }

  test("small inventories render every query without folding") {
    val line = Bench.shortLine(queries(10), sf)
    assert(!line.contains("_other_total"))
    (1 to 10).foreach(i => assert(line.contains(f"q_generated_operator_name_$i%03d")))
  }

  test("run id binds the short line to BENCH_FULL.json: embedded, stable, timing-sensitive") {
    val q = queries(300)
    val rid = Bench.runId(q)
    assert(rid.matches("[0-9a-f]{12}"))
    // Deterministic over map order; sensitive to any single timing.
    assert(Bench.runId(q.toSeq.reverse.toMap) == rid)
    assert(Bench.runId(q.updated(q.keys.head, 99.0)) != rid)
    val line = Bench.shortLine(q, sf, runId = rid)
    assert(line.length <= 1500, s"line length ${line.length}")
    assert(line.contains(s""""run":"$rid""""))
    // sf stays the LAST field (driver tail-parse invariant).
    assert(line.endsWith(s""","sf":"$sf"}"""))
    // Folding still happens with the run id present.
    assert(line.contains("_other_total"))
    // Without a run id the field is absent entirely.
    assert(!Bench.shortLine(q, sf).contains(""""run":"""))
  }

  test("shuffle_bytes rides the short line compactly and under budget") {
    val shuffle = (1 to 150).map(i => f"q_generated_operator_name_$i%03d" -> i * 1000L).toMap
    val line = Bench.shortLine(queries(106), sf, shuffle)
    assert(line.length <= 1500, s"line length ${line.length}")
    assert(line.contains(""""shuffle_bytes":{"""))
    assert(line.count(_ == '{') == 3 && line.count(_ == '}') == 3)
    // top-8 by bytes only: the heaviest writer is present, the lightest absent
    assert(line.contains(""""q_generated_operator_name_150":150000"""))
    assert(!line.contains(""""q_generated_operator_name_001":1000"""))
    assert(line.endsWith(s""","sf":"$sf"}"""))
    // without a shuffle map the line shape is unchanged (2 braces)
    val plain = Bench.shortLine(queries(106), sf)
    assert(plain.count(_ == '{') == 2 && plain.count(_ == '}') == 2)
  }
}
