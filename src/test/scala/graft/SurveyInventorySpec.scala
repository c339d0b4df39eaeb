package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical SURVEY §2 ↔ code inventory pin (r8 verdict task 3): the
  * round-8 judge found `curate_dp_counts` shipped and oracle-green but
  * absent from the §2 inventory — nothing enforced the invariant. This
  * spec does: every `SparkEntry.queries` key must appear as a backtick
  * token inside SURVEY §2, and every §2 backtick token that LOOKS like a
  * queries key (one of the inventory's name families) must be a real
  * key. Either drift — a shipped-but-undocumented operator, or a
  * documented-but-unshipped key — fails CI.
  */
class SurveyInventorySpec extends AnyFunSuite {

  private lazy val section2: String = {
    val md = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    // §2 spans from its heading to the next top-level §N heading.
    val start = md.indexOf("## §2")
    assert(start >= 0, "SURVEY.md lost its '## §2' heading")
    val rest = md.substring(start)
    "(?m)^## §[3-9]".r.findFirstMatchIn(rest)
      .map(m => rest.substring(0, m.start)).getOrElse(rest)
  }

  // The inventory's name families: a backtick token with one of these
  // prefixes inside §2 is claiming to be a queries key.
  private val keyLike =
    "^(ann|curate|dedup|emb|ev|llm|ml|mm|profile|q|q1|src|text)_[a-z0-9_]+$".r

  private lazy val surveyKeys: Set[String] =
    "`([a-z0-9_]+)`".r.findAllMatchIn(section2).map(_.group(1))
      .filter(t => keyLike.matches(t)).toSet

  test("every SparkEntry.queries key has a SURVEY §2 row") {
    val missing = SparkEntry.queries.keySet -- surveyKeys
    assert(missing.isEmpty,
      s"shipped operators missing from SURVEY §2 (add a capability row): ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every key-like backtick token in SURVEY §2 is a shipped queries key") {
    val phantom = surveyKeys -- SparkEntry.queries.keySet
    assert(phantom.isEmpty,
      s"SURVEY §2 documents keys that don't exist in SparkEntry.queries: ${phantom.toSeq.sorted.mkString(", ")}")
  }
}
