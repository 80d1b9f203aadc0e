package graft.ops

import graft.{Query, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII scrubbing over `documents` — the redaction pass (emails, phone
  * numbers, IPv4 addresses) every public-web training corpus runs before
  * anything else sees the text. Not in the reference; first-class
  * curation surface per the builder brief.
  *
  * Regex discipline: Spark compiles java.util.regex, DuckDB compiles RE2
  * — the patterns below stay inside the dialect intersection (character
  * classes, bounded repetition; NO lookaround, NO \d shorthands) so both
  * engines match identical spans and the oracle compares the scrubbed
  * TEXT byte-for-byte, not just the counts. The synthetic corpus is
  * PII-free (the oracle proves zero redactions and text identity);
  * planted-PII semantics are pinned by ScrubSpec.
  *
  * 100 TB design: pure per-row projection — regex evaluation inside
  * whole-stage codegen, no shuffle, no state; counts are computed on the
  * ORIGINAL text before any replacement, so evidence and redaction can't
  * disagree. */
object Scrub {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** Dialect-intersection patterns (java.util.regex ∩ RE2). The phone
    * class deliberately EXCLUDES '.' so a dotted quad ("192.168.254.3")
    * can never phone-match ahead of the IP pass — dot-separated phone
    * styles are traded for count/redaction consistency. */
  val EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PHONE_RE = "\\+?[0-9][0-9 ()/-]{7,}[0-9]"
  val IPV4_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  // ---------------------------------------------------------------- q72

  /** Redact emails → phones → IPv4 (fixed order, so overlapping spans
    * resolve identically everywhere) and report per-doc match counts and
    * a `pii_free` verdict. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select($"doc_id",
        regexp_replace(
          regexp_replace(
            regexp_replace($"text", EMAIL_RE, "<EMAIL>"),
            PHONE_RE, "<PHONE>"),
          IPV4_RE, "<IP>").as("text_clean"),
        regexp_count($"text", lit(EMAIL_RE)).cast("long").as("n_emails"),
        regexp_count($"text", lit(PHONE_RE)).cast("long").as("n_phones"),
        regexp_count($"text", lit(IPV4_RE)).cast("long").as("n_ips"))
      .withColumn("pii_free",
        $"n_emails" + $"n_phones" + $"n_ips" === 0)
  }

  private val piiScrubOracle =
    s"""SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$EMAIL_RE', '<EMAIL>', 'g'),
       |    '$PHONE_RE', '<PHONE>', 'g'),
       |    '$IPV4_RE', '<IP>', 'g') AS text_clean,
       |  CAST(len(regexp_extract_all(text, '$EMAIL_RE')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$PHONE_RE')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(text, '$IPV4_RE')) AS BIGINT) AS n_ips,
       |  (len(regexp_extract_all(text, '$EMAIL_RE'))
       |   + len(regexp_extract_all(text, '$PHONE_RE'))
       |   + len(regexp_extract_all(text, '$IPV4_RE'))) = 0 AS pii_free
       |FROM documents ORDER BY doc_id""".stripMargin

  val all: Seq[Query] = Seq(
    Query("q72_pii_scrub",
      "PII redaction (email/phone/IPv4) with per-doc evidence counts, dialect-intersection regexes",
      // orderBy is compare-presentation (q42 precedent): the bench times
      // the unordered projection, which reads the scan exactly once
      (s, d) => piiScrub(s, d).orderBy("doc_id"),
      Some(piiScrubOracle), headline = false,
      benchFn = Some(piiScrub)))
}
