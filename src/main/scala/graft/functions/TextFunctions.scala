package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines.
  *
  * Everything here is composed from Spark's codegen'd built-ins (no UDFs,
  * no CodegenFallback) so the expressions stay inside whole-stage codegen
  * — the 100 TB hot path. The sketch functions (MinHash / SimHash) and the
  * language-ID heuristic need imperative loops and live in
  * [[Sketches]] / [[LangId]] as native expressions.
  */
object TextFunctions {

  /** Whitespace token count. */
  def tokenCount(c: Column): Column =
    size(WhitespaceTokens.wsTokens(c)).cast("long")

  /** BPE-ish token count: words, digit runs and individual punctuation
    * count separately (a cheap proxy for subword tokenizers; mirrors the
    * common `\w+|[^\w\s]` pre-tokenizer split).
    */
  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit("[\\p{L}]+|[0-9]+|[^\\p{L}0-9\\s]")).cast("long")

  /** Ratio of stopword tokens (case-insensitive, small multilingual list). */
  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "in", "to", "is",
    "le", "la", "de", "et", "der", "die", "das", "und",
    "el", "los", "y", "que")

  def stopwordRatio(c: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = WhitespaceTokens.wsTokens(lower(c))
    size(filter(toks, w => w.isin(stopwords: _*))).cast("double") /
      greatest(size(toks).cast("double"), lit(1.0))
  }

  /** Mean token length in characters. */
  def avgWordLen(c: Column): Column = {
    val toks = WhitespaceTokens.wsTokens(c)
    aggregate(transform(toks, w => length(w)), lit(0), (a, x) => a + x)
      .cast("double") /
      greatest(size(toks).cast("double"), lit(1.0))
  }

  /** Punctuation character ratio. */
  def punctRatio(c: Column): Column =
    regexp_count(c, lit("[^\\p{L}0-9\\s]")).cast("double") /
      greatest(length(c).cast("double"), lit(1.0))

  /** Composite quality score in [0,1] — the length/punct/stopword heuristic
    * family (higher = more natural-language-like). Weights are fixed so the
    * score is deterministic and comparable across runs.
    */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val lenScore = least(nTok / lit(64.0), lit(1.0))
    val stopScore = least(stopwordRatio(c) * lit(4.0), lit(1.0))
    val wordLenOk = (avgWordLen(c) >= 2.0 && avgWordLen(c) <= 12.0).cast("double")
    val punctOk = (punctRatio(c) <= 0.2).cast("double")
    val score = lenScore * 0.3 + stopScore * 0.3 + wordLenOk * 0.2 + punctOk * 0.2
    // floor-truncate instead of round: round() half-way handling differs
    // between engines (BigDecimal HALF_UP vs raw-double), floor is exact
    // whenever the computed doubles are bit-identical.
    floor(score * 10000.0) / 10000.0
  }

  /** Whitespace-normalized lowercase form (canonical content identity). */
  def normalized(c: Column): Column =
    lower(regexp_replace(trim(c), "\\s+", " "))

  /** 64-bit content fingerprint of the normalized text (xxhash64 — stable
    * across Spark versions, cheap, codegen'd). For the rolling-hash n-gram
    * fingerprint (winnowing) see [[Sketches.fingerprintNgrams]].
    */
  def fingerprint64(c: Column): Column = xxhash64(normalized(c))

  // --- PII detection / redaction -----------------------------------------
  //
  // The regexes stay inside the RE2 ∩ java.util.regex common subset
  // (character classes, bounded repetition, \b word boundaries — no
  // lookaround, no backrefs) so any engine replays them identically; the
  // DuckDB oracle runs the same patterns through RE2.

  /** Email addresses (practical form, not full RFC 5322). */
  val piiEmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic — no octet range check, by design: a
    * scrubber should over- rather than under-redact).
    */
  val piiIpRegex = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** NANP-style phone numbers NNN-NNN-NNNN. */
  val piiPhoneRegex = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  def piiEmailCount(c: Column): Column = regexp_count(c, lit(piiEmailRegex)).cast("long")
  def piiIpCount(c: Column): Column = regexp_count(c, lit(piiIpRegex)).cast("long")
  def piiPhoneCount(c: Column): Column = regexp_count(c, lit(piiPhoneRegex)).cast("long")

  /** Replace each PII class with a typed placeholder. Emails are redacted
    * first so an address's host part can never be half-matched as an IP
    * afterwards; phones run last (their digits can't occur inside the
    * other two patterns' matches once those are tags).
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, piiEmailRegex, "<EMAIL>"),
        piiIpRegex, "<IP>"),
      piiPhoneRegex, "<PHONE>")

  /** Canonicalize a URL for crawl dedup — the standard web-pipeline key:
    * lowercase scheme and host, strip a leading `www.`, drop the default
    * port (`:80` for http, `:443` for https), strip the fragment and any
    * trailing slashes on the path, remove tracking parameters
    * (`utm_*`, `fbclid`, `gclid`) and sort the survivors byte-wise.
    * `http://www.A.com:80/x/?b=2&utm_source=f&a=1#top` and
    * `HTTP://a.com/x?a=1&b=2` collapse to the same key.
    *
    * Built entirely from codegen'd built-ins (regexes in the RE2∩Java
    * subset, like [[redactPii]]) — row-local, no UDF, and replayable
    * verbatim in any engine, which is what makes the dedup-by-URL gate
    * oracle-exact.
    */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[^:/?#]+://([^/?#]*)", 1))
    val noWww = regexp_replace(hostPort, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val path = regexp_replace(
      regexp_extract(noFrag, "^[^:/?#]+://[^/?#]*(/[^?#]*)?", 1), "/+$", "")
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => p =!= lit("") && !p.rlike("^(utm_[^=]*|fbclid|gclid)(=|$)"))
    val canonQ = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(canonQ === "", lit("")).otherwise(concat(lit("?"), canonQ)))
  }

  /** Word n-gram shingles as an array column (distinct). */
  def shingles(c: Column, n: Int): Column = {
    val words = WhitespaceTokens.wsTokens(c)
    array_distinct(
      transform(sequence(lit(0), greatest(size(words) - n, lit(0))),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
  }
}
