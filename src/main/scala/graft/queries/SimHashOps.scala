package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Oracle-checkable SimHash: a 60-bit fingerprint built from md5 (the one
  * cryptographic hash both Spark and DuckDB expose bit-identically), so
  * the fingerprint — not just row counts — is verified end-to-end by the
  * DuckDB hash gate. The production-path SimHash stays the native
  * 64-bit xxhash64 codegen kernel (`dedup_simhash`, spec-verified);
  * this variant proves the ALGORITHM (per-bit ±1 vote over token hashes,
  * sign → bit) against an independent engine.
  *
  * Shape: explode tokens → 60-bit md5 prefix hash per token (15 hex
  * chars keeps the value positive in a signed 64-bit long on both
  * engines) → explode bit positions 0..59 → per-(doc, bit) vote sum →
  * per-doc fingerprint Σ 2^bit over positive votes. All shuffles key on
  * (doc_id, bit) — high cardinality, no skew, linear in corpus size.
  */
object SimHashOps {

  val defs: Map[String, QDef] = Map(

    "dedup_simhash_md5" -> QDef(
      (s, dir) => {
        Tables(s, dir, "documents").createOrReplaceTempView("documents")
        s.sql(
          """WITH toks AS (
            |  SELECT doc_id, tok
            |  FROM documents LATERAL VIEW explode(split(text, ' ')) t AS tok
            |  WHERE tok <> ''
            |), h AS (
            |  SELECT doc_id, CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT) AS h
            |  FROM toks
            |), bits AS (
            |  SELECT doc_id, bit,
            |    SUM(CASE WHEN (shiftright(h, bit) & 1) = 1 THEN 1 ELSE -1 END) AS s
            |  FROM h LATERAL VIEW explode(sequence(0, 59)) b AS bit
            |  GROUP BY doc_id, bit
            |)
            |SELECT doc_id,
            |  SUM(CASE WHEN s > 0 THEN CAST(pow(2.0, bit) AS BIGINT) ELSE 0 END) AS simhash60
            |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin)
      },
      """WITH toks AS (
        |  SELECT doc_id, tok
        |  FROM documents, unnest(string_split(text, ' ')) AS t(tok)
        |  WHERE tok <> ''
        |), h AS (
        |  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
        |  FROM toks
        |), bits AS (
        |  SELECT doc_id, bit,
        |    SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM h, generate_series(0, 59) AS g(bit)
        |  GROUP BY doc_id, bit
        |)
        |SELECT doc_id,
        |  CAST(SUM(CASE WHEN s > 0 THEN CAST(pow(2.0, bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash60
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  )
}
