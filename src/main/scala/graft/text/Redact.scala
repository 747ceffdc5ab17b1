package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII masking kernels for training-data cleaning: emails and
  * phone-shaped digit groups replaced by typed placeholder tokens.
  * Pure `regexp_replace`/`regexp_extract_all` chains — codegen'd,
  * per-row, shuffle-free, so redaction runs at scan speed over any
  * corpus size. Patterns are deliberately RE2-compatible (no
  * backreferences/lookaround) so the same regex runs in Spark, in
  * the DuckDB oracle, and in any downstream engine.
  */
object Redact {

  val emailRe = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
  val phoneRe = "[0-9]{3}-[0-9]{4}"

  def maskEmails(c: Column): Column = regexp_replace(c, emailRe, "<EMAIL>")

  def maskPhones(c: Column): Column = regexp_replace(c, phoneRe, "<PHONE>")

  /** Full redaction chain (emails first so phone-like digit runs
    * inside addresses are already gone).
    */
  def redactPii(c: Column): Column = maskPhones(maskEmails(c))

  def emailCount(c: Column): Column =
    size(regexp_extract_all(c, lit(emailRe), lit(0)))

  def phoneCount(c: Column): Column =
    size(regexp_extract_all(c, lit(phoneRe), lit(0)))

  // ---- extended classes (q153): full NANP numbers and IPv4 ----
  // \b word boundaries are RE2-compatible (ASCII semantics match
  // java.util.regex on ASCII text) and keep a 10-digit NANP number
  // from being half-eaten by the short phoneRe above.

  val nanpRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val ipRe = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  def maskNanp(c: Column): Column = regexp_replace(c, nanpRe, "<PHONE>")

  def maskIps(c: Column): Column = regexp_replace(c, ipRe, "<IP>")

  def nanpCount(c: Column): Column =
    size(regexp_extract_all(c, lit(nanpRe), lit(0)))

  def ipCount(c: Column): Column =
    size(regexp_extract_all(c, lit(ipRe), lit(0)))

  /** Full scrub over every class, as ONE codegen'd single-scan kernel
    * ([[graft.expressions.PiiScrub]]): a combined alternation in
    * chain-priority order with class-keyed replacement. The chained
    * form below is the reference semantics (and the DuckDB oracle
    * shape); RedactSpec pins byte-equality between the two on
    * PII-laden corpora — they can differ only on raw adjacency
    * collisions between classes, documented at the kernel.
    */
  def redactAll(c: Column): Column = {
    import org.apache.spark.sql.GraftShim
    GraftShim.column(
      graft.expressions.PiiScrub(GraftShim.expression(c)))
  }

  /** Reference chain over every class — 4 sequential full-text
    * scans. Order is load-bearing and fixed: emails first (digit
    * runs inside addresses disappear with them), then 10-digit NANP
    * before the short phone pattern (whose ddd-dddd shape is a
    * substring of every NANP number), IPs last. [[redactAll]] is the
    * single-scan production form of exactly this chain.
    */
  def redactAllChained(c: Column): Column =
    maskIps(maskPhones(maskNanp(maskEmails(c))))
}
