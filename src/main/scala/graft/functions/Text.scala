package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the north-star LLM-pipeline operators
  * (SURVEY.md §2.6): tokenization, shingling, language-ID heuristic,
  * quality scoring, token counting, fingerprinting.
  *
  * Everything here is a pure Column expression (codegen'd higher-order
  * array functions — no UDFs), so the ops stay inside whole-stage codegen
  * and scale to 100 TB as embarrassingly-parallel per-row work.
  */
object Text {

  /** Whitespace tokenization after lowercasing + trim — executes as the
    * native single-pass [[Tokens]] kernel (the declarative
    * `filter(split(lower(trim(text)), "\\s+"), len > 0)` form is two
    * CodegenFallback HOF passes that Catalyst re-inlines into every
    * referencing predicate; [[tokensHof]] keeps it as the semantic spec
    * the equivalence test pins against). */
  def tokens(text: Column): Column = Tokens(text)

  /** The declarative formulation [[tokens]] is bit-equivalent to —
    * kept as the executable spec for TextKernelSpec's corpus-wide pin
    * (and the shape the DuckDB oracles replay). */
  private[graft] def tokensHof(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** BPE-ish sub-word token count: runs of alphanumerics count as one token,
    * every other non-space character as its own token (a cheap deterministic
    * stand-in for a real BPE vocab). */
  def tokenCountBpeish(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Canonical text normalization for dedup keys and fingerprints:
    * lowercase, punctuation/symbols to spaces, whitespace runs
    * collapsed to one space, trimmed. The usual first stage of a
    * cleaning pipeline — exact/near dedup over `normalizeForDedup`
    * output catches case/punctuation variants of the same content.
    * Pure codegen built-ins (two regexp_replace + lower + trim), ASCII
    * contract like the rest of the text battery. */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "),
      "\\s+", " "))

  /** ASCII-contract guard for the md5-prefix-key and char-slice ORACLE
    * families (OracleXxh object doc; r13 verdict task 6). Those DuckDB
    * oracles compare per-CHARACTER — DuckDB cannot slice or md5 BLOBs,
    * and its `lower` is per-codepoint (not final-sigma context-aware
    * like the JVM's) — so gate equivalence is exact ONLY on ASCII
    * text. The engine operators themselves are byte-correct for any
    * input; this guard enforces the ORACLE's precondition at the gate
    * query, turning a silent hash divergence on a future non-ASCII
    * corpus into a loud analysis-time failure naming the query.
    *
    * Plan-side and cheap: `length == octet_length` (⇔ pure ASCII for
    * valid UTF-8 — every non-ASCII codepoint is ≥2 bytes) rides the
    * existing scan as two codegen'd intrinsics; no regex, no extra
    * action, and because the guard REPLACES the column it can never
    * be pruned away from a query that reads it. */
  def asciiOracleGuard(text: Column, who: String): Column =
    // NULL passes through: length(NULL)===octet_length(NULL) is NULL —
    // without the isNull arm the when() would fall to raise_error on a
    // NULL row, though NULL is oracle-safe (md5(NULL)=NULL both engines).
    when(text.isNull || length(text) === octet_length(text), text)
      .otherwise(raise_error(concat(
        lit(s"$who: non-ASCII input — the md5-prefix/char-slice oracle " +
          "contract (OracleXxh doc) admits ASCII only; offending text: "),
        substring(text, 1, 40))))

  /** Word n-gram shingles from a MATERIALIZED tokens column.
    *
    * `ts` must be a column attribute (produced by a separate projection),
    * not an inline `tokens(text)` expression: this expression references
    * `ts` once per shingle index, and Catalyst inlines single-use
    * subexpressions into lambda bodies — an inline tokenizer would re-split
    * the document O(tokens) times (observed as a 900 s bench stage).
    * Multi-referenced non-cheap projections are NOT collapsed, so a
    * dedicated `.select(..., tokens(c).as("t"))` step is safe.
    *
    * slice() is 1-based. Guarded for docs shorter than n tokens —
    * `sequence(1, 0)` would generate a DESCENDING range, not an empty one. */
  def shinglesFromTokens(ts: Column, n: Int): Column = {
    // the kernel siblings (ShingleHashes, PosShingleHashes, WinnowPrints)
    // all require n >= 1; without it n=0 silently yields one empty-string
    // shingle per position (every doc MinHash-matches every other) and a
    // negative n dies deep inside slice() with an opaque error
    require(n >= 1, s"shingle size must be >= 1: $n")
    when(size(ts) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(ts) - (n - 1)),
        i => array_join(slice(ts, i, lit(n)), " ")))
  }

  /** Convenience single-expression form — fine for one-shot use, but for
    * plans that reuse the shingles (MinHash, Jaccard) go through
    * [[shinglesFromTokens]] over a materialized tokens column. */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** Distinct shingle set (for Jaccard/MinHash). */
  def shingleSet(text: Column, n: Int): Column =
    array_distinct(shingles(text, n))

  // --- language ID (n-gram/stopword heuristic) -----------------------------

  /** Tiny per-language stopword inventories. A real system would ship
    * character-n-gram profiles; the operator shape (per-row argmax over
    * per-language evidence scores) is identical. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it",
      "for", "on", "with", "as", "at", "this", "fast", "slow", "small"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es",
      "por", "con", "para", "los", "las", "se", "no"),
    "de" -> Seq("der", "die", "das", "und", "in", "den", "von", "zu",
      "mit", "ist", "des", "im", "ein", "eine", "auf", "für"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "en", "un", "une",
      "du", "est", "que", "pour", "dans", "par", "sur"))

  /** Count of tokens (with multiplicity) belonging to `lang`'s stopword
    * set — the per-language evidence score. The native [[TokenSetHits]]
    * kernel: one zero-copy pass over the lowered bytes, exact string
    * membership (parity with the HOF spec pinned in TextKernelSpec). */
  def stopwordHits(text: Column, lang: String): Column =
    TokenSetHits(text, stopwords(lang))

  /** [[stopwordHits]] over an already-materialized tokens column. */
  def stopwordHitsOf(ts: Column, lang: String): Column = {
    val stops = array(stopwords(lang).map(lit): _*)
    size(filter(ts, t => array_contains(stops, t)))
  }

  /** Heuristic language ID: argmax of stopword hits across known languages;
    * ties broken by language code order; all-zero evidence → "und"
    * (undetermined, BCP-47 style). The native [[graft.functions.LangId]]
    * kernel — every language scored in ONE pass (one map probe per
    * token), so it stays cheap even when pushdown inlines it into a
    * scan predicate; [[langIdOf]] remains the executable spec. */
  def langId(text: Column): Column =
    LangId(text, stopwords.toSeq.sortBy(_._1))

  /** [[langId]] over an already-materialized tokens column (the 100 TB
    * form: one tokenization feeding every per-language evidence score). */
  def langIdOf(ts: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    // array_max on structs orders lexicographically: hits first, then lang.
    // For equal hits the LARGER lang code wins under max; to get ties-to-
    // smallest we negate via (hits, reverse order index).
    val best = langs.zipWithIndex.map { case (l, i) =>
      struct(stopwordHitsOf(ts, l).as("hits"),
        lit(langs.size - i).as("ord"), lit(l).as("lang"))
    }
    val top = array_max(array(best: _*))
    when(top.getField("hits") === 0, lit("und"))
      .otherwise(top.getField("lang"))
  }

  // --- quality scoring -----------------------------------------------------

  /** Token count straight from the raw bytes — the native
    * [[TokenCount]] kernel, == `size(tokens(text))` (parity pinned in
    * TextKernelSpec) without paying the lowercase copy + token-array
    * build the count immediately discards. */
  def nTokens(text: Column): Column = TokenCount(text)

  def nTokensOf(ts: Column): Column = size(ts)

  def meanTokenLen(text: Column): Column = meanTokenLenOf(tokens(text))

  def meanTokenLenOf(ts: Column): Column = {
    val totalChars = aggregate(ts, lit(0L), (acc, t) => acc + length(t))
    totalChars.cast("double") / size(ts)
  }

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column = {
    val punct = length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}-]", ""))
    punct.cast("double") / length(text)
  }

  /** Fraction of tokens that are (any-language) stopwords — both the
    * hit count and the token count off the raw bytes (zero-alloc
    * kernels). A 0-token doc is NULL via the nullif'd divisor — the
    * HOF spec THREW ANSI DIVIDE_BY_ZERO there, so a single empty doc
    * could kill a corpus-wide quality pass. */
  def stopwordRatio(text: Column): Column =
    TokenSetHits(text, stopwords.values.flatten.toSeq.distinct)
      .cast("double") / nullif(TokenCount(text), lit(0))

  /** [[stopwordRatio]] over an already-materialized tokens column. */
  def stopwordRatioOf(ts: Column): Column = {
    val all = array(stopwords.values.flatten.toSeq.distinct.map(lit): _*)
    size(filter(ts, t => array_contains(all, t))).cast("double") / size(ts)
  }

  /** Composite quality score in [0,1]: rewards mid-length docs with low
    * punctuation noise and a natural stopword ratio. Weights are fixed,
    * deterministic, and documented — the operator contract is the shape
    * (per-doc score for filtering), not the constants. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(nTokens(text).cast("double") / 16.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    // a 0-token doc has a NULL stopword ratio (nullif'd divisor) and an
    // empty doc a NaN punct ratio; Spark's least() SKIPS NULLs and
    // sorts NaN greatest, which silently awarded blank docs their full
    // stop+punct sub-scores ("   " scored 0.6) — a quality score must
    // send the emptiest possible document to the floor instead
    when(nTokens(text) === 0, lit(0.0))
      .otherwise(round(lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3,
        6))
  }

  // --- PII scrubbing -------------------------------------------------------

  /** Redact common PII shapes — emails, IPv4 addresses, card/id digit
    * runs, phone numbers — with typed placeholder tokens, the standard
    * pre-training text-cleaning step. Pure regexp_replace chain: per-row,
    * codegen'd, embarrassingly parallel; every pattern is RE2-compatible
    * (no lookaround), so the same chain runs verbatim in any RE2 engine
    * (oracled as q_scrub_pii against DuckDB).
    *
    * The digit rules are date-safe by construction: the long-run rule
    * wants ≥9 digits joined only by `()-` (an 8-digit ISO date
    * `2026-08-12` passes through), and the phone rule wants the
    * cc? (area) 3-4 grouping (colons keep `10:30:45` timestamps out).
    * Conservative by design; a production deployment swaps in its
    * compliance-approved pattern set at this seam. */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>")
    // ids/cards: ≥9 digits with ()- separators only (no spaces — a
    // timestamp's date half never glues to its time half)
    val run = regexp_replace(ip,
      "\\+?\\b\\d(?:[()-]*\\d){8,}\\b", "<NUMBER>")
    // phones with spaced grouping the run rule misses: +1 (555) 123-4567
    regexp_replace(run,
      "\\+?\\b(?:\\d{1,2}[ -]?)?\\(?\\d{3}\\)?[ -]?\\d{3}[ -]?\\d{4}\\b",
      "<NUMBER>")
  }

  /** Literal-phrase blocklist hits: how many of `phrases` occur in the
    * (lower-cased) text, plus the matched phrases themselves — the
    * wordlist gate every production corpus runs (NSFW/spam/site-
    * boilerplate lists). Pure codegen built-ins: the phrase table rides
    * the plan as an array literal and each row does K `contains` probes
    * — map-only, no join, no shuffle; for lists past a few thousand
    * entries switch to a broadcast join on extracted tokens (this is
    * the small-K fast path). Matching is case-insensitive SUBSTRING
    * containment (phrase lists are normalized lower-case by
    * convention; word-boundary semantics belong to the list author —
    * encode them as spaces in the phrase). */
  def blocklistHits(text: Column, phrases: Seq[String]): Column = {
    require(phrases.nonEmpty, "blocklistHits: empty phrase list")
    require(phrases.forall(p => p.nonEmpty && p == p.toLowerCase),
      "blocklist phrases must be non-empty and lower-case")
    val lo = lower(text)
    filter(lit(phrases.toArray), p => lo.contains(p))
  }

  /** Per-document PII DETECTION counts — the audit face of
    * [[scrubPii]]: (n_email, n_ip, n_number) as a struct, counted as
    * the scrubber's own redaction placeholders in the scrubbed text,
    * so detection and redaction can never disagree (a count rule
    * diverging from the replace rule is the classic compliance-audit
    * bug). Pure codegen built-ins (the scrub chain + split-count);
    * same RE2-compatible pattern seam as the scrubber. */
  def piiCounts(text: Column): Column = {
    val s = scrubPii(text)
    def cnt(tok: String): Column =
      (size(split(s, tok)) - 1).cast("long")
    struct(cnt("<EMAIL>").as("n_email"), cnt("<IP>").as("n_ip"),
      cnt("<NUMBER>").as("n_number"))
  }

  // --- fingerprinting ------------------------------------------------------

  /** Content fingerprint of whitespace-normalized lowercase text: first 16
    * hex chars of md5 (engine-portable, oracle-checkable). Collision odds at
    * 64 bits are fine for dedup bucketing; use full sha256 for addressing. */
  def fingerprint(text: Column): Column =
    // `trim(regexp_replace(lower(text), "\\s+", " "))` is byte-equal to
    // `array_join(tokens(text), " ")` (whitespace runs → one space,
    // ends stripped — after the replace, ends are 0x20 runs, exactly
    // what trim removes) but runs as THREE native codegen string ops
    // with no array materialization; equality pinned corpus-wide in
    // TextKernelSpec
    substring(md5(trim(regexp_replace(lower(text), "\\s+", " "))), 1, 16)

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD'03): over the POSITIONAL k-gram hash sequence (duplicates
    * kept — position matters, unlike the dedup shingle set), keep the
    * minimum hash of every w-long window, deduplicated. The winnowing
    * guarantee: two documents sharing a token run of ≥ w+k-1 tokens
    * share at least one selected print — robust substring matching with
    * ~2/(w+1) of the k-gram density.
    *
    * Native codegen kernel ([[graft.functions.WinnowPrints]]): the
    * paper's deque-based O(tokens) loop, one compiled call per row.
    * xxhash64-based → rows-only, invariants pinned in ScalaTest;
    * HOF-formulation parity pinned by WinnowSpec. */
  def winnow(ts: Column, k: Int, w: Int): Column = WinnowPrints(ts, k, w)

  /** Rolling polynomial hash over the token stream (Rabin-Karp style):
    * acc = (acc * 1000003 + xxhash64(token)) mod p, p = 1e9+7 — the mod
    * keeps the accumulator < 2^30 so ANSI long arithmetic never overflows.
    * Order-sensitive (unlike a set hash) and computed as a sequential
    * fold — per-row, so still embarrassingly parallel across docs. */
  def rollingFingerprint(text: Column): Column = {
    val p = 1000000007L
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * lit(1000003L) + pmod(xxhash64(t), lit(p)),
        lit(p)))
  }
}
