package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text functions re-expressing the reference's scalar surface
  * (SURVEY.md §2.8) with codegen'd Spark built-ins — no UDFs in the hot
  * path, so every function here stays inside whole-stage codegen and
  * benefits from predicate pushdown / constant folding.
  *
  * Reference citations (behavioral, intent-preserving — known reference
  * bugs like the over-escaped URL regex of staging-transform.py:158 are
  * NOT replicated, per SURVEY.md §7.4):
  *  - cleanTweet:    staging-transform.py:151-177 (C1)
  *  - cleanHashtags: staging-transform.py:180-182 (C2)
  *  - surrogateKey:  staging-transform.py:189-191,:243-247 (C8)
  *  - tokens/explode: staging-transform.py:239-240 (C5/C6)
  */
object TextFunctions {

  /** C1: tweet-text cleaning chain. Order preserved from the reference:
    * URLs → quotes → RT/amp tokens → non-word chars → whitespace collapse.
    * The reference strips the literal substrings "RT"/"amp" anywhere in a
    * word (a bug); we strip them as standalone tokens (the evident intent:
    * drop retweet markers and HTML-entity remnants before sentiment).
    */
  def cleanTweet(c: Column): Column = {
    val noUrl     = regexp_replace(c, "https?://\\S+|www\\.\\S+", " ")
    val noQuote   = regexp_replace(noUrl, "\"", "")
    val noMarkers = regexp_replace(noQuote, "\\b(RT|amp)\\b", " ")
    val noSymbol  = regexp_replace(noMarkers, "[^\\w\\s]+", " ")
    trim(regexp_replace(noSymbol, "\\s+", " "))
  }

  /** C2: keep only alphanumerics and whitespace in the hashtag string. */
  def cleanHashtags(c: Column): Column =
    regexp_replace(c, "[^A-Za-z0-9\\s]+", "")

  /** C8: surrogate primary key = base64 of the *raw* sha1 digest (the
    * reference base64-encodes digest bytes, not the hex string). Spark's
    * `sha1` yields hex, so `unhex` recovers the digest bytes first.
    * Known-answer vector: "12345first_tweet_idhello" →
    * "ndZ/aJsTFIXIqB1vQBMM3k/JHr4=" (FIXTURES.md B.6).
    */
  def surrogateKey(cols: Column*): Column =
    base64(unhex(sha1(concat(cols: _*))))

  /** sha256 variant of the surrogate key — same base64-of-raw-digest
    * shape; used where the oracle engine lacks sha1. */
  def surrogateKey256(cols: Column*): Column =
    base64(unhex(sha2(concat(cols: _*), 256)))

  /** Delimited surrogate key: same base64-of-raw-sha1 shape, but fields
    * are joined on U+0001 so boundary-ambiguous tuples — ("12", "3x") vs
    * ("1", "23x") — cannot hash identically. [[surrogateKey]] keeps the
    * reference's undelimited concat for C8 parity (the known-answer
    * vector above depends on it); new pipelines should prefer this one.
    * Note `concat_ws` skips nulls where `concat` nulls the whole key —
    * callers keying on nullable columns must pre-coalesce. */
  def surrogateKeyDelimited(cols: Column*): Column =
    base64(unhex(sha1(concat_ws("\u0001", cols: _*))))

  /** C5: whitespace tokenization → array<string>; empty input → empty
    * array (split of "" yields [""], which we filter).
    */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => t =!= "")

  /** Whitespace token count — codegen'd, no array materialization cost
    * beyond the split. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: counts word pieces, digits runs, and isolated
    * punctuation the way byte-pair tokenizers split, via one regexp scan.
    * Approximates LLM token counting without a vocab file.
    */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Character n-gram shingles as array<string> (for MinHash / Jaccard).
    * Pure built-ins; shingle count = max(len - n + 1, 0).
    *
    * The input rides into the per-position lambda via array_repeat +
    * zip_with, NOT as a captured outer expression: a HOF lambda
    * re-evaluates any non-attribute subexpression once per ELEMENT
    * (HOFs are CodegenFallback, so no common-subexpression rescue),
    * which turns a caller passing e.g. `normalizeWs(text)` into one
    * regex pass per shingle. array_repeat evaluates its element
    * argument exactly once and repeats the reference, so the lambda
    * body touches only its own bound variables.
    */
  def charShingles(c: Column, n: Int): Column = {
    val len = length(c)
    val cnt = len - lit(n - 1)
    when(len < n, array()).otherwise(
      zip_with(sequence(lit(1), cnt), array_repeat(c, cnt),
        (i, s) => s.substr(i, lit(n))))
  }

  /** Word n-gram shingles from a token array. Capture-safe the same way
    * [[charShingles]] is: the token array enters the lambda via
    * array_repeat + zip_with and is evaluated once per row, however
    * complex the caller's expression. */
  def wordShingles(tokensCol: Column, n: Int): Column = {
    val cnt = size(tokensCol)
    when(cnt < n, array()).otherwise(
      zip_with(sequence(lit(0), cnt - lit(n)),
        array_repeat(tokensCol, cnt - lit(n) + 1),
        (i, tks) => concat_ws(" ", slice(tks, i + 1, lit(n)))))
  }

  /** Rolling document fingerprint: xxhash64 over the normalized text —
    * lower-cased, whitespace-collapsed — a cheap content identity for
    * exact-duplicate detection that survives formatting differences.
    */
  def fingerprint(c: Column): Column =
    xxhash64(normalizeWs(c))

  /** Lower-case + collapse all whitespace runs to single spaces. */
  def normalizeWs(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** PII redaction for training corpora: emails, IPv4 addresses, and
    * phone-like digit runs replaced with fixed tags. Order matters —
    * emails first (so phone matching can't eat an address's digits),
    * then IPs (whose dotted quads would otherwise match the phone
    * pattern), then phones. Conservative patterns: a phone is 7+ DIGITS
    * with optional separators between them (so 5551234 and 555-0100 both
    * redact), counted on digits rather than total span so benign 5-6
    * digit spans like '100-200' or '2024-08' pass through.
    * Pure regexp_replace chain — codegen'd, map-side, no dictionary. */
  def redactPii(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\+?\\d(?:[ ()\\-]*\\d){6,}", "<PHONE>")
  }

  /** HTML/markup stripping for web-crawl corpora: script/style blocks
    * dropped whole (their text is code, not prose), remaining tags become
    * spaces (so `a<br>b` stays two words), the five standard entities
    * unescape — `&amp;` LAST so a freshly produced `&` cannot re-trigger
    * an earlier entity — then whitespace collapses. Case preserved.
    * Every step is an RE2-compatible regex or a literal replace, so a SQL
    * oracle can mirror the chain exactly; pure codegen'd map work. */
  def stripMarkup(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "(?s)<[^>]*>", " ")
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (e, r)) => replace(acc, lit(e), lit(r)) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }
}
