package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q111 — PII detection + redaction, the scrub pass every training-data
  * pipeline runs before anything else ships. Nine classes: emails, IPv4s,
  * +1-555 phones, SSN shapes (the original four) plus — r14 — payment
  * cards (shape + a REAL Luhn check as pure integer arithmetic), IBAN
  * shapes, E.164 international phones, full-form IPv6, and MAC addresses.
  *
  * The synthetic fixtures contain no PII, so — exactly the q109
  * [[UniCorpus]] doctrine (FIXTURES.md) — the row derives a PII-bearing
  * corpus from `documents` with engine-exact string ops: each doc is
  * prefixed with one deterministic PII literal chosen by `doc_id % 9`
  * (email / in-range IPv4 / +1-555 phone / SSN shape / dashed 16-digit
  * card drawn from six Luhn-VALID industry test PANs / IBAN shape /
  * E.164 / 8-group IPv6 / MAC), every doc carries a decoy tail that must
  * NOT match (3-group version string, 4-digit build tag, domain-less `@`,
  * wrong-shape dashed digits, letter-prefixed dotted quad, short `DE99`,
  * 5-digit `+12345`, a 7-group IPv6 near-miss, a 5-group MAC near-miss,
  * a lowercase IBAN) AND one adversarial Luhn-NEGATIVE card shape
  * (`1111-1111-1111-1111` — shape-matched, shape-redacted, never counted:
  * pins that both engines run the same checksum arithmetic, not just the
  * same regex), docs with `doc_id % 5 = 0` get a SECOND email so
  * per-class counts exceed one per doc, and docs with `doc_id % 7 = 0`
  * end with the adversarial `1.2.3.4.5` (a five-group quad whose FIRST
  * four groups are a legal `\b`-delimited match — pinning that both
  * engines share greedy-left, non-overlapping scan semantics). Detection
  * and redaction then run over identical strings in both engines, so any
  * Java-vs-RE2 divergence in the pattern subset used here breaks the
  * oracle hash.
  *
  * Patterns stay inside the Java∩RE2 common subset (character classes,
  * bounded repetition, non-capturing groups, ASCII `\b`, no
  * backrefs/lookaround — both engines give them identical semantics on
  * ASCII text). Card policy is shape-redact / Luhn-count: redaction
  * removes EVERY card-shaped run (a scrubber never leaves a near-PAN
  * behind), while `n_card` counts only candidates whose digits pass the
  * Luhn checksum — computed in BOTH engines as an integer fold over the
  * digit positions (no library call), so the count is exact and
  * cross-engine. Redaction is the sequential email → card → ipv6 → mac →
  * ipv4 → e164 → phone → ssn → iban rewrite; counts are measured
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
  * per-row, codegen'd `RegExpReplace`/`RegExpCount`; the Luhn count is
  * the native `graft_luhn_cards` — one static call in the same codegen
  * stage), then a map-side combinable groupBy on `source` — zero
  * corpus-wide shuffles; the only exchange carries |sources| partial-agg
  * rows. Survives 100 TB by construction.
  */
object PiiScan {

  /** Java∩RE2 pattern subset — see class doc. */
  private[graft] val EmailRe = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
  private[graft] val Ipv4Re  = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  private[graft] val PhoneRe = """\+1-555-\d{4}\b"""
  private[graft] val SsnRe   = """\b\d{3}-\d{2}-\d{4}\b"""
  /** Card CANDIDATE shape (dashed 16-digit); `n_card` additionally
    * requires the Luhn checksum — see [[graft.functions.LuhnCardCount]],
    * the single source of this pattern. */
  private[graft] val CardRe  = graft.functions.LuhnCardCount.CardRe
  /** IBAN SHAPE (country + check digits + 10-30 alnum); the mod-97
    * checksum is out of scope — documented shape-only, like SSN. */
  private[graft] val IbanRe  = """\b[A-Z]{2}\d{2}[A-Z0-9]{10,30}\b"""
  /** E.164: leading +, no separators, 7-15 digits total. No leading \b —
    * `+` is a non-word char, a boundary before it never fires. */
  private[graft] val E164Re  = """\+[1-9]\d{6,14}\b"""
  /** Full-form IPv6 (8 colon-separated hex groups; `::` compression out
    * of scope — documented subset). Lowercase hex, like the corpus. */
  private[graft] val Ipv6Re  = """\b(?:[0-9a-f]{1,4}:){7}[0-9a-f]{1,4}\b"""
  private[graft] val MacRe   = """\b(?:[0-9a-f]{2}:){5}[0-9a-f]{2}\b"""

  /** Six Luhn-VALID 16-digit test PANs (public industry test numbers),
    * dashed to the candidate shape. */
  private[graft] val ValidPans = Seq(
    "4111-1111-1111-1111", "4012-8888-8888-1881", "5555-5555-5555-4444",
    "5105-1051-0510-5100", "6011-1111-1111-1117", "3566-0020-2036-0505")

  /** Decoy tail carried by EVERY doc — each fragment is a near-miss for
    * one pattern class and must match none of them. */
  private val Decoys = " ver 2.0.1 build-1234 x@ 5-55-555 a1.b2.c3.d4" +
    " DE99 +12345 1111:2222:3333:4444:5555:6666:7777 ab:cd:ef:00:11" +
    " de89370400440532013000"

  /** Adversarial Luhn-NEGATIVE card shape carried by EVERY doc:
    * shape-matched (so it IS redacted) but never counted. */
  private val LuhnDecoy = " 1111-1111-1111-1111"

  /** The PII-bearing corpus: (doc_id, source, text) with the derivation
    * law above, identical strings in both engines by construction. */
  private[graft] def decorated(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    def s(c: Column): Column = c.cast("string")
    val pan = ValidPans.zipWithIndex.tail.foldLeft(
      when(expr("(doc_id DIV 9) % 6") === 0, lit(ValidPans.head))) {
        case (acc, (p, i)) => acc.when(expr("(doc_id DIV 9) % 6") === i, lit(p))
      }
    val ip6 = concat(lit("2001:0db8:"),
      concat_ws(":", (0 to 5).map(j =>
        lpad(s((id * (j + 3)) % 10000), 4, "0")): _*))
    val mac = concat(lit("0a:"),
      concat_ws(":", (0 to 4).map(j =>
        lpad(s((id * (j + 7)) % 100), 2, "0")): _*))
    val pii = when(id % 9 === 0,
        concat(lit("user."), s(id), lit("@mail"), s(id % 10), lit(".example.com")))
      .when(id % 9 === 1,
        concat(lit("10."), s(id % 256), lit("."), s((id * 7) % 256), lit("."), s(id % 250)))
      .when(id % 9 === 2,
        concat(lit("+1-555-"), lpad(s(id % 10000), 4, "0")))
      .when(id % 9 === 3,
        concat(s(id % 900 + 100), lit("-"), s(id % 90 + 10), lit("-"), s(id % 9000 + 1000)))
      .when(id % 9 === 4, pan)
      .when(id % 9 === 5,
        concat(lit("DE"), lpad(s(id % 90 + 10), 2, "0"), lpad(s(id), 18, "0")))
      .when(id % 9 === 6,
        concat(lit("+44"), lpad(s(id % 1000000000L), 9, "0")))
      .when(id % 9 === 7, ip6)
      .otherwise(mac)
    val extra = when(id % 5 === 0,
        concat(lit(" ops-"), s(id % 97), lit("@ops.example.org")))
      .otherwise(lit(""))
    val tricky = when(id % 7 === 0, lit(" 1.2.3.4.5")).otherwise(lit(""))
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        concat(lit("pii: "), pii, lit(" "), col("text"),
          lit(Decoys), lit(LuhnDecoy), extra, tricky).as("text"))
  }

  /** DuckDB twin of [[decorated]]'s text expression. */
  private def decoratedSql: String = {
    val panCases = ValidPans.zipWithIndex
      .map { case (p, i) => s"WHEN (doc_id // 9) % 6 = $i THEN '$p'" }
      .mkString(" ")
    val ip6 = "'2001:0db8:' || " + (0 to 5)
      .map(j => s"lpad(CAST((doc_id * ${j + 3}) % 10000 AS VARCHAR), 4, '0')")
      .mkString(" || ':' || ")
    val mac = "'0a:' || " + (0 to 4)
      .map(j => s"lpad(CAST((doc_id * ${j + 7}) % 100 AS VARCHAR), 2, '0')")
      .mkString(" || ':' || ")
    s"""SELECT doc_id, source,
       |    'pii: ' ||
       |    CASE
       |      WHEN doc_id % 9 = 0 THEN 'user.' || CAST(doc_id AS VARCHAR) ||
       |        '@mail' || CAST(doc_id % 10 AS VARCHAR) || '.example.com'
       |      WHEN doc_id % 9 = 1 THEN '10.' || CAST(doc_id % 256 AS VARCHAR) ||
       |        '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR)
       |      WHEN doc_id % 9 = 2 THEN '+1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |      WHEN doc_id % 9 = 3 THEN CAST(doc_id % 900 + 100 AS VARCHAR) || '-' ||
       |        CAST(doc_id % 90 + 10 AS VARCHAR) || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR)
       |      WHEN doc_id % 9 = 4 THEN CASE $panCases END
       |      WHEN doc_id % 9 = 5 THEN 'DE' || lpad(CAST(doc_id % 90 + 10 AS VARCHAR), 2, '0') ||
       |        lpad(CAST(doc_id AS VARCHAR), 18, '0')
       |      WHEN doc_id % 9 = 6 THEN '+44' || lpad(CAST(doc_id % 1000000000 AS VARCHAR), 9, '0')
       |      WHEN doc_id % 9 = 7 THEN $ip6
       |      ELSE $mac
       |    END ||
       |    ' ' || text || '$Decoys$LuhnDecoy' ||
       |    CASE WHEN doc_id % 5 = 0
       |         THEN ' ops-' || CAST(doc_id % 97 AS VARCHAR) || '@ops.example.org'
       |         ELSE '' END ||
       |    CASE WHEN doc_id % 7 = 0 THEN ' 1.2.3.4.5' ELSE '' END AS text
       |  FROM documents WHERE text IS NOT NULL""".stripMargin
  }

  /** Scrub a docs relation in place: `text` → its redaction. A pure
    * per-row projection (stateless, row-local), so it is legal in a
    * streaming plan unchanged — [[graft.streaming.StreamMain]] applies it
    * at ingest under `--scrub-pii`, BEFORE any state is built, so dedup
    * fingerprints / indexes / exports never see a raw identifier (the
    * batch row q111 and the stream stage share this one expression and
    * cannot diverge). The r14 classes are inherited here for free — same
    * expression. Null text stays null (regexp_replace propagates),
    * matching the gate's null admission law. */
  def scrub(docs: DataFrame): DataFrame =
    docs.withColumn("text", redact(col("text")))

  /** Sequential typed redaction — email → card → ipv6 → mac → ipv4 →
    * e164 → phone → ssn → iban. Card is SHAPE-redacted (Luhn-negative
    * shapes go too — a scrubber never leaves a near-PAN behind). */
  private[graft] def redact(text: Column): Column =
    Seq(EmailRe -> "<EMAIL>", CardRe -> "<CARD>", Ipv6Re -> "<IP6>",
        MacRe -> "<MAC>", Ipv4Re -> "<IP>", E164Re -> "<E164>",
        PhoneRe -> "<PHONE>", SsnRe -> "<ID>", IbanRe -> "<IBAN>")
      .foldLeft(text) { case (t, (re, tok)) => regexp_replace(t, re, tok) }

  /** Luhn-valid card count: the native codegen expression (the HOF chain
    * it replaced tripped the no-interpreted-HOF plan contract). The DuckDB
    * twin spells the identical right-to-left integer fold as list lambdas
    * in [[q111Sql]]. */
  private[graft] def cardCount(text: Column): Column =
    graft.functions.Text.luhnCards(text)

  def q111PiiScan(s: SparkSession, d: String): DataFrame = {
    val per = decorated(Tables.documents(s, d))
      .select(col("source"),
        regexp_count(col("text"), lit(EmailRe)).as("em"),
        regexp_count(col("text"), lit(Ipv4Re)).as("ip"),
        regexp_count(col("text"), lit(PhoneRe)).as("ph"),
        regexp_count(col("text"), lit(SsnRe)).as("id"),
        cardCount(col("text")).as("cd"),
        regexp_count(col("text"), lit(IbanRe)).as("ib"),
        regexp_count(col("text"), lit(E164Re)).as("e1"),
        regexp_count(col("text"), lit(Ipv6Re)).as("i6"),
        regexp_count(col("text"), lit(MacRe)).as("mc"),
        (length(col("text")) - length(redact(col("text")))).as("cut"),
        (graft.functions.Vectors.md5Prefix48(redact(col("text"))) % 1000003L).as("ck"))
    per.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("em")).as("n_email"),
        sum(col("ip")).as("n_ip"),
        sum(col("ph")).as("n_phone"),
        sum(col("id")).as("n_ssn"),
        sum(col("cd")).as("n_card"),
        sum(col("ib")).as("n_iban"),
        sum(col("e1")).as("n_e164"),
        sum(col("i6")).as("n_ip6"),
        sum(col("mc")).as("n_mac"),
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
       |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |    regexp_replace(
       |      text, '$EmailRe', '<EMAIL>', 'g'),
       |      '$CardRe', '<CARD>', 'g'),
       |      '$Ipv6Re', '<IP6>', 'g'),
       |      '$MacRe', '<MAC>', 'g'),
       |      '$Ipv4Re', '<IP>', 'g'),
       |      '$E164Re', '<E164>', 'g'),
       |      '$PhoneRe', '<PHONE>', 'g'),
       |      '$SsnRe', '<ID>', 'g'),
       |      '$IbanRe', '<IBAN>', 'g') AS red
       |  FROM deco
       |), per AS (
       |  SELECT source,
       |    len(regexp_extract_all(text, '$EmailRe')) AS em,
       |    len(regexp_extract_all(text, '$Ipv4Re')) AS ip,
       |    len(regexp_extract_all(text, '$PhoneRe')) AS ph,
       |    len(regexp_extract_all(text, '$SsnRe')) AS id,
       |    len(list_filter(
       |      list_transform(regexp_extract_all(text, '$CardRe'),
       |        c -> regexp_replace(c, '[^0-9]', '', 'g')),
       |      ds -> list_sum(list_transform(range(1, len(ds) + 1),
       |          i -> CASE WHEN (len(ds) - i) % 2 = 1
       |                    THEN CASE WHEN 2 * CAST(ds[i] AS INT) > 9
       |                              THEN 2 * CAST(ds[i] AS INT) - 9
       |                              ELSE 2 * CAST(ds[i] AS INT) END
       |                    ELSE CAST(ds[i] AS INT) END)) % 10 = 0)) AS cd,
       |    len(regexp_extract_all(text, '$IbanRe')) AS ib,
       |    len(regexp_extract_all(text, '$E164Re')) AS e1,
       |    len(regexp_extract_all(text, '$Ipv6Re')) AS i6,
       |    len(regexp_extract_all(text, '$MacRe')) AS mc,
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
       |  CAST(sum(cd) AS BIGINT) AS n_card,
       |  CAST(sum(ib) AS BIGINT) AS n_iban,
       |  CAST(sum(e1) AS BIGINT) AS n_e164,
       |  CAST(sum(i6) AS BIGINT) AS n_ip6,
       |  CAST(sum(mc) AS BIGINT) AS n_mac,
       |  CAST(sum(cut) AS BIGINT) AS chars_redacted,
       |  CAST(sum(ck) AS BIGINT) AS red_checksum
       |FROM per GROUP BY source ORDER BY source""".stripMargin
}
