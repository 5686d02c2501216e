package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q111 — PII detection + redaction, the scrub pass every training-data
  * pipeline runs before anything else ships (emails, IPv4s, phone numbers,
  * SSN-shaped ids → typed placeholder tokens).
  *
  * The synthetic fixtures contain no PII, so — exactly the q109
  * [[UniCorpus]] doctrine (FIXTURES.md) — the row derives a PII-bearing
  * corpus from `documents` with engine-exact string ops: each doc is
  * prefixed with one deterministic PII literal chosen by `doc_id % 4`
  * (email / in-range IPv4 / +1-555 phone / SSN shape), every doc carries a
  * decoy tail that must NOT match (3-group version string, 4-digit build
  * tag, domain-less `@`, wrong-shape dashed digits, letter-prefixed dotted
  * quad), docs with `doc_id % 5 = 0` get a SECOND email so per-class
  * counts exceed one per doc, and docs with `doc_id % 7 = 0` end with the
  * adversarial `1.2.3.4.5` (a five-group quad whose FIRST four groups are
  * a legal `\b`-delimited match — pinning that both engines share
  * greedy-left, non-overlapping scan semantics). Detection and redaction
  * then run over identical strings in both engines, so any Java-vs-RE2
  * divergence in the pattern subset used here breaks the oracle hash.
  *
  * Patterns stay inside the Java∩RE2 common subset (character classes,
  * bounded repetition, ASCII `\b`, no backrefs/lookaround — both engines
  * give them identical semantics on ASCII text). Redaction is the
  * sequential email → ip → phone → ssn rewrite; counts are measured
  * per-class on the UN-redacted text (independent scans, the shape a
  * compliance report wants).
  *
  * Declared row: per-source totals — docs, per-class hit counts, total
  * characters removed by redaction, and an order-insensitive corpus
  * checksum of the REDACTED texts (48-bit md5 folded mod 1000003 before
  * the sum so a 100 TB corpus cannot overflow int64). A redaction bug that
  * leaves one byte behind moves `chars_redacted` AND `red_checksum`.
  *
  * Scale shape: one narrow projection per document (regex scans are
  * per-row, codegen'd `RegExpReplace`/`RegExpCount`), then a map-side
  * combinable groupBy on `source` — zero corpus-wide shuffles; the only
  * exchange carries |sources| partial-agg rows. Survives 100 TB by
  * construction.
  */
object PiiScan {

  /** Java∩RE2 pattern subset — see class doc. */
  private[graft] val EmailRe = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
  private[graft] val Ipv4Re  = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  private[graft] val PhoneRe = """\+1-555-\d{4}\b"""
  private[graft] val SsnRe   = """\b\d{3}-\d{2}-\d{4}\b"""

  /** Decoy tail carried by EVERY doc — each fragment is a near-miss for
    * one pattern class and must match none of them. */
  private val Decoys = " ver 2.0.1 build-1234 x@ 5-55-555 a1.b2.c3.d4"

  /** The PII-bearing corpus: (doc_id, source, text) with the derivation
    * law above, identical strings in both engines by construction. */
  private[graft] def decorated(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    def s(c: Column): Column = c.cast("string")
    val pii = when(id % 4 === 0,
        concat(lit("user."), s(id), lit("@mail"), s(id % 10), lit(".example.com")))
      .when(id % 4 === 1,
        concat(lit("10."), s(id % 256), lit("."), s((id * 7) % 256), lit("."), s(id % 250)))
      .when(id % 4 === 2,
        concat(lit("+1-555-"), lpad(s(id % 10000), 4, "0")))
      .otherwise(
        concat(s(id % 900 + 100), lit("-"), s(id % 90 + 10), lit("-"), s(id % 9000 + 1000)))
    val extra = when(id % 5 === 0,
        concat(lit(" ops-"), s(id % 97), lit("@ops.example.org")))
      .otherwise(lit(""))
    val tricky = when(id % 7 === 0, lit(" 1.2.3.4.5")).otherwise(lit(""))
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        concat(lit("pii: "), pii, lit(" "), col("text"),
          lit(Decoys), extra, tricky).as("text"))
  }

  /** DuckDB twin of [[decorated]]'s text expression. */
  private def decoratedSql: String =
    s"""SELECT doc_id, source,
       |    'pii: ' ||
       |    CASE
       |      WHEN doc_id % 4 = 0 THEN 'user.' || CAST(doc_id AS VARCHAR) ||
       |        '@mail' || CAST(doc_id % 10 AS VARCHAR) || '.example.com'
       |      WHEN doc_id % 4 = 1 THEN '10.' || CAST(doc_id % 256 AS VARCHAR) ||
       |        '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR)
       |      WHEN doc_id % 4 = 2 THEN '+1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |      ELSE CAST(doc_id % 900 + 100 AS VARCHAR) || '-' ||
       |        CAST(doc_id % 90 + 10 AS VARCHAR) || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR)
       |    END ||
       |    ' ' || text || '$Decoys' ||
       |    CASE WHEN doc_id % 5 = 0
       |         THEN ' ops-' || CAST(doc_id % 97 AS VARCHAR) || '@ops.example.org'
       |         ELSE '' END ||
       |    CASE WHEN doc_id % 7 = 0 THEN ' 1.2.3.4.5' ELSE '' END AS text
       |  FROM documents WHERE text IS NOT NULL""".stripMargin

  /** Scrub a docs relation in place: `text` → its redaction. A pure
    * per-row projection (stateless, row-local), so it is legal in a
    * streaming plan unchanged — [[graft.streaming.StreamMain]] applies it
    * at ingest under `--scrub-pii`, BEFORE any state is built, so dedup
    * fingerprints / indexes / exports never see a raw identifier (the
    * batch row q111 and the stream stage share this one expression and
    * cannot diverge). Null text stays null (regexp_replace propagates),
    * matching the gate's null admission law. */
  def scrub(docs: DataFrame): DataFrame =
    docs.withColumn("text", redact(col("text")))

  /** Sequential typed redaction — email → ip → phone → ssn. */
  private[graft] def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>"),
      SsnRe, "<ID>")

  def q111PiiScan(s: SparkSession, d: String): DataFrame = {
    val per = decorated(Tables.documents(s, d))
      .select(col("source"),
        regexp_count(col("text"), lit(EmailRe)).as("em"),
        regexp_count(col("text"), lit(Ipv4Re)).as("ip"),
        regexp_count(col("text"), lit(PhoneRe)).as("ph"),
        regexp_count(col("text"), lit(SsnRe)).as("id"),
        (length(col("text")) - length(redact(col("text")))).as("cut"),
        (graft.functions.Vectors.md5Prefix48(redact(col("text"))) % 1000003L).as("ck"))
    per.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("em")).as("n_email"),
        sum(col("ip")).as("n_ip"),
        sum(col("ph")).as("n_phone"),
        sum(col("id")).as("n_ssn"),
        sum(col("cut")).as("chars_redacted"),
        sum(col("ck")).as("red_checksum"))
      .orderBy(col("source"))
  }

  def q111Sql: String =
    s"""WITH deco AS (
       |  $decoratedSql
       |), redacted AS (
       |  -- redaction named once so the twin pays the regex chain once per
       |  -- row, like the engine side (codegen subexpression elimination)
       |  SELECT source, text,
       |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |      text, '$EmailRe', '<EMAIL>', 'g'),
       |      '$Ipv4Re', '<IP>', 'g'),
       |      '$PhoneRe', '<PHONE>', 'g'),
       |      '$SsnRe', '<ID>', 'g') AS red
       |  FROM deco
       |), per AS (
       |  SELECT source,
       |    len(regexp_extract_all(text, '$EmailRe')) AS em,
       |    len(regexp_extract_all(text, '$Ipv4Re')) AS ip,
       |    len(regexp_extract_all(text, '$PhoneRe')) AS ph,
       |    len(regexp_extract_all(text, '$SsnRe')) AS id,
       |    length(text) - length(red) AS cut,
       |    ('0x' || substr(md5(red), 1, 12))::BIGINT % 1000003 AS ck
       |  FROM redacted
       |)
       |SELECT source,
       |  count(*) AS n_docs,
       |  CAST(sum(em) AS BIGINT) AS n_email,
       |  CAST(sum(ip) AS BIGINT) AS n_ip,
       |  CAST(sum(ph) AS BIGINT) AS n_phone,
       |  CAST(sum(id) AS BIGINT) AS n_ssn,
       |  CAST(sum(cut) AS BIGINT) AS chars_redacted,
       |  CAST(sum(ck) AS BIGINT) AS red_checksum
       |FROM per GROUP BY source ORDER BY source""".stripMargin
}
