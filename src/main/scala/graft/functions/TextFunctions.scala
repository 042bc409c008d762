package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernels for large-scale corpus pipelines: tokenization,
  * normalization, fingerprinting, language ID, and quality scoring.
  *
  * All pure built-in expressions (whole-stage codegen, no UDFs), so they
  * run at full scan speed over 100 TB and push no state to the driver.
  * No reference counterpart — these extend the engine for LLM-data
  * pipelines (see BASELINE.json north star).
  */
object TextFunctions {

  /** Whitespace tokens of a text column. NB split semantics: an
    * empty/whitespace-only input yields `[""]` (one empty token, size
    * 1) — this matches the SQL-oracle construction
    * (`string_split_regex(trim(text), ' +')`), which is the contract
    * the token-count/ratio metrics are checked against. */
  def tokens(c: Column): Column = split(trim(c), " +")

  /** Token count by whitespace split. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-style pre-tokenizer count: runs of word chars OR single
    * non-word non-space chars (`\w+|[^\w\s]`) — the shape GPT-2-family
    * pre-tokenizers produce before merges, so it tracks real LLM token
    * counts far better than whitespace splitting on punctuated text.
    * `regexp_extract_all` is a codegen'd built-in, and the pattern is
    * dialect-portable (RE2 and Java agree on \w/\s here), so the count
    * is oracle-checkable. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Lowercase, strip non-alphanumerics (keeping spaces), collapse runs
    * of spaces, trim — canonical form for fingerprinting/dedup. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** Deterministic document fingerprint: md5 of the normalized text.
    * Cross-engine stable (md5 is md5 everywhere), unlike xxhash64. */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  /** Distinct word n-gram shingles, joined with '_'. Documents shorter
    * than n tokens yield an empty array. */
  def wordShingles(c: Column, n: Int): Column = {
    val w = tokens(c)
    when(size(w) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => concat_ws("_", slice(w, i, lit(n))))))
  }

  /** Jaccard similarity of the distinct word n-gram shingle sets of two
    * text columns (in double). */
  def ngramJaccard(a: Column, b: Column, n: Int): Column =
    shingleJaccard(wordShingles(a, n), wordShingles(b, n))

  /** Jaccard over two pre-computed distinct-element arrays. The union
    * size is derived arithmetically (|A u B| = |A| + |B| - |A n B|,
    * exact for distinct arrays), so only the intersection is ever
    * materialized — half the per-pair array work of an
    * intersect+union formulation, with bit-identical results (the
    * counts are the same integers either way). */
  def shingleJaccard(sa: Column, sb: Column): Column = {
    val i = size(array_intersect(sa, sb)).cast("double")
    i / nullif(size(sa).cast("double") + size(sb).cast("double") - i, lit(0.0))
  }

  /** Sorted 64-bit hashes of a distinct-shingle string array — the
    * shape [[graft.expressions.SortedIntersectCount]] consumes. Hash
    * ONCE per document here (map-side), so the per-pair Jaccard never
    * touches a string again: the verify joins ship 8-byte longs and
    * the intersection is a primitive merge walk. Distinctness carries
    * over unless two shingles collide in 64 bits (~2^-64/pair — the
    * standard hashed-shingle trade; a collision would nudge Jaccard by
    * one count). */
  def hashedShingles(sh: Column): Column =
    array_sort(transform(sh, t => xxhash64(t)))

  /** [[shingleJaccard]] over pre-hashed sorted arrays from
    * [[hashedShingles]]: same integers (intersection count and sizes
    * are collision-free in practice), ~10x cheaper per pair. */
  def shingleJaccardHashed(
      df: org.apache.spark.sql.DataFrame, ha: Column, hb: Column): Column = {
    val i = graft.expressions.GraftFunctions.sortedIntersect(df, ha, hb).cast("double")
    i / nullif(size(ha).cast("double") + size(hb).cast("double") - i, lit(0.0))
  }

  /** Language markers: per-language stopword lists for the n-gram
    * heuristic. Deterministic; tie-break follows declaration order. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "fr" -> Seq("le", "la", "et", "les"),
    "de" -> Seq("der", "die", "und", "das"),
    "es" -> Seq("el", "los", "las", "y"),
  )

  /** Count of tokens appearing in `markers`. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => markers.map(m => t === m).reduce(_ || _)))

  /** Heuristic language ID: argmax of per-language marker-token counts,
    * declaration order breaking ties; all-zero scores -> "und". */
  def langId(c: Column): Column = {
    val t = tokens(c)
    val scores = LangMarkers.map { case (lang, ms) => lang -> markerCount(t, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // foldRight nests the WHENs so declaration order wins ties.
    scores.foldRight(lit("und")) { case ((lang, s), elseExpr) =>
      when(s === best && s > 0, lit(lang)).otherwise(elseExpr)
    }
  }

  /** Quality metrics for corpus filtering, one struct per document:
    * character count, token count, mean token length, alphanumeric
    * ratio, and English-stopword ratio. All ratios are single divisions
    * of exact integer counts — deterministic across engines. */
  def qualityMetrics(c: Column): Column = {
    val t = tokens(c)
    val nChars = length(c)
    val nToks = size(t)
    val alnum = length(regexp_replace(c, "[^a-zA-Z0-9]", ""))
    val stop = markerCount(t, LangMarkers.head._2)
    struct(
      nChars.as("n_chars"),
      nToks.as("n_tokens"),
      (length(regexp_replace(c, " ", "")).cast("double") /
        nToks.cast("double")).as("mean_token_len"),
      (alnum.cast("double") / nChars.cast("double")).as("alnum_ratio"),
      (stop.cast("double") / nToks.cast("double")).as("stopword_ratio"))
  }

  /** Repetition metrics for corpus filtering (the Gopher-rule family:
    * heavily self-repeating documents are low-quality boilerplate/spam
    * and get dropped before training). One struct per document:
    * token count, distinct-token count, duplicated-token fraction
    * (`1 - distinct/total`), and the fraction of bigram slots taken by
    * the single most frequent bigram. Pure per-row expressions —
    * map-only, no shuffle, cost O(distinct * total) per doc, bounded by
    * document length not corpus size. Fractions are single divisions of
    * exact integer counts — deterministic across engines. */
  def repetitionMetrics(c: Column): Column = {
    val t = tokens(c)
    val nToks = size(t)
    val bigrams = when(nToks < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), nToks - 1),
        i => concat(element_at(t, i), lit("_"), element_at(t, i + 1))))
    val topBigram = array_max(transform(array_distinct(bigrams),
      x => size(filter(bigrams, y => y === x))))
    struct(
      nToks.as("n_tokens"),
      size(array_distinct(t)).as("n_distinct_tokens"),
      (lit(1.0) - size(array_distinct(t)).cast("double") / nToks.cast("double"))
        .as("dup_token_frac"),
      coalesce(topBigram.cast("double") / (nToks - 1).cast("double"), lit(0.0))
        .as("top_bigram_frac"))
  }

  /** Structural repetition metrics — the remaining Gopher-rule siblings
    * of [[repetitionMetrics]] (Rae et al. 2021, "Scaling Language
    * Models", Table A1): the fraction of a document's LINES (and
    * PARAGRAPHS) that are repeats of an earlier identical line (resp.
    * paragraph), and the fraction of its line (paragraph) CHARACTERS
    * inside those repeats. Docs built from templates/boilerplate score
    * high on the count fractions; docs whose few repeated lines are the
    * LONG ones (nav blocks, legal footers) are caught by the char
    * fractions even when the count fractions look tame.
    *
    * Definitions (exact integer counts, single final divisions):
    * units = non-empty segments after splitting on `\n` (lines) or on
    * blank-line runs `\n\n+` (paragraphs); a "duplicate" is every
    * occurrence of a value BEYOND its first, so
    * `dup_frac = (n - n_distinct) / n` and
    * `dup_char_frac = (chars(all) - chars(distinct values)) / chars(all)`
    * (the second identity holds because each value's first occurrence
    * is the one `array_distinct` keeps). Empty/unit-free docs score 0.
    *
    * One struct per document, pure per-row built-in expressions —
    * map-only, no shuffle, cost O(units²) worst-case per doc (the
    * `array_distinct` scan), bounded by document length not corpus
    * size; every fraction is a single division of exact integers, so
    * the struct is oracle-checkable cross-engine with no rounding
    * gate. */
  def structuralRepetitionMetrics(c: Column): Column = {
    def metrics(units: Column, prefix: String): Seq[Column] = {
      val n = size(units)
      val dist = array_distinct(units)
      val nDist = size(dist)
      val chars = aggregate(units, lit(0L), (acc, u) => acc + length(u))
      val distChars = aggregate(dist, lit(0L), (acc, u) => acc + length(u))
      Seq(
        n.as(s"n_${prefix}s"),
        nDist.as(s"n_distinct_${prefix}s"),
        when(n === 0, lit(0.0))
          .otherwise((n - nDist).cast("double") / n.cast("double"))
          .as(s"dup_${prefix}_frac"),
        when(chars === 0L, lit(0.0))
          .otherwise((chars - distChars).cast("double") / chars.cast("double"))
          .as(s"dup_${prefix}_char_frac"))
    }
    val lines = filter(split(c, "\n"), u => length(u) > 0)
    val paras = filter(split(c, "\n\n+"), u => length(u) > 0)
    struct(metrics(lines, "line") ++ metrics(paras, "paragraph"): _*)
  }

  /** Gopher line-format quality rules (Rae et al. 2021, Table A1 — the
    * formatting siblings of [[structuralRepetitionMetrics]]): the
    * fraction of lines that START with a bullet marker (`• `, `- `,
    * `* ` — Gopher drops at 90%), the fraction that END in an
    * ellipsis (`...` or `…` — drops at 30%, the truncated-listicle
    * signal), the `#`/`...` symbol-to-word ratio (drops at 0.1), and
    * the fraction of words containing at least one alphabetic
    * character (keeps at 80%). Lines are the non-empty `\n` segments,
    * words the whitespace tokens; symbol counts ride the
    * `length − length(replace)` identity (non-overlapping
    * leftmost-first, identical cross-engine), so every fraction is a
    * single division of exact integers. Map-only per-row expressions,
    * no shuffle; empty docs score 0 on line fractions, and the
    * one-empty-token contract of [[tokens]] keeps the word divisions
    * total. One struct per document: (`n_lines`, `bullet_line_frac`,
    * `ellipsis_line_frac`, `n_words`, `symbol_word_ratio`,
    * `alpha_word_frac`). */
  def gopherLineRules(c: Column): Column = {
    val lines = filter(split(c, "\n"), u => length(u) > 0)
    val n = size(lines)
    val bullets = size(filter(lines, u =>
      startswith(u, lit("• ")) || startswith(u, lit("- ")) ||
        startswith(u, lit("* "))))
    val ellipses = size(filter(lines, u =>
      endswith(u, lit("...")) || endswith(u, lit("…"))))
    val toks = tokens(c)
    val nWords = size(toks)
    val hashes = length(c) - length(replace(c, lit("#"), lit("")))
    val dotRuns = ((length(c) - length(replace(c, lit("..."), lit(""))))
      .cast("double") / lit(3.0)).cast("long")
    val alphaWords = size(filter(toks, t => t.rlike("[A-Za-z]")))
    struct(
      n.as("n_lines"),
      when(n === 0, lit(0.0))
        .otherwise(bullets.cast("double") / n.cast("double"))
        .as("bullet_line_frac"),
      when(n === 0, lit(0.0))
        .otherwise(ellipses.cast("double") / n.cast("double"))
        .as("ellipsis_line_frac"),
      nWords.as("n_words"),
      ((hashes + dotRuns).cast("double") / nWords.cast("double"))
        .as("symbol_word_ratio"),
      (alphaWords.cast("double") / nWords.cast("double"))
        .as("alpha_word_frac"))
  }

  /** Shannon entropy (bits) of the CHARACTER unigram distribution of a
    * string — the gibberish/low-diversity filter next to
    * [[repetitionMetrics]]: binary junk decoded as text scores high,
    * single-character runs and trivially repetitive spam score near
    * zero, natural language sits in a narrow band. Pure per-row
    * expressions — map-only, no shuffle; per-char counts via the
    * `length - length(replace)` identity, so cost is
    * O(distinct_chars * length) per doc, bounded by document length.
    * The fold adds one IEEE term per DISTINCT char (first-occurrence
    * order); consumers comparing cross-engine round to 6 decimals —
    * the term ORDER can differ, the rounded sum cannot. NULL/empty
    * input scores 0. */
  def charEntropyBits(c: Column): Column = {
    val n = length(c).cast("double")
    val ent = aggregate(array_distinct(split(c, "")),
      lit(0.0),
      (acc, ch) => {
        val cnt = (length(c) - length(replace(c, ch, lit("")))).cast("double")
        acc - (cnt / n) * log2(cnt / n)
      })
    coalesce(when(length(c) === 0, lit(0.0)).otherwise(ent), lit(0.0))
  }

  /** Shannon entropy (bits) of the TOKEN unigram distribution —
    * [[charEntropyBits]] at word granularity, the "effective
    * vocabulary" signal: keyword-stuffed or template-generated docs
    * have many tokens but few bits. Same map-only shape, cost
    * O(distinct_tokens * n_tokens) per doc. NULL/empty input scores
    * 0; the same 6-decimal rounding discipline applies cross-engine. */
  def tokenEntropyBits(c: Column): Column = {
    val t = tokens(c)
    val n = size(t).cast("double")
    val ent = aggregate(array_distinct(t),
      lit(0.0),
      (acc, tok) => {
        val cnt = size(filter(t, x => x === tok)).cast("double")
        acc - (cnt / n) * log2(cnt / n)
      })
    coalesce(when(size(t) === 0, lit(0.0)).otherwise(ent), lit(0.0))
  }

  /** 32-bit per-token hash reproducible across engines: the first 8 hex
    * chars of md5, parsed to a long. Slower than xxhash64 (md5 + string
    * slicing) but bit-identical in any engine with md5 — DuckDB
    * reproduces it with hex-digit arithmetic, so simhash/rolling
    * fingerprints built on it are oracle-checkable. All ANSI-safe: the
    * parsed value is < 2^32, far from Long overflow. */
  def portableTokenHash32(t: Column): Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast("long")

  /** 64-bit portable token hash: md5's first 16 hex chars as a signed
    * two's-complement long, built from two 32-bit halves. The naive
    * `conv(16 hex chars)` would produce unsigned values past
    * Long.MaxValue (ANSI cast failure); instead the high half is
    * sign-adjusted BEFORE the shift-combine, so every intermediate
    * stays inside [-2^63, 2^63) exactly:
    * hi >= 2^31 (bit 63 set) -> (hi - 2^32) * 2^32 + lo in [-2^63, -1];
    * otherwise hi * 2^32 + lo in [0, 2^63 - 2^32 + 2^32 - 1]. DuckDB
    * reproduces the identical CASE over identical BIGINT arithmetic. */
  def portableTokenHash64(t: Column): Column = {
    val h = md5(t)
    val hi = conv(substring(h, 1, 8), 16, 10).cast("long")
    val lo = conv(substring(h, 9, 8), 16, 10).cast("long")
    when(hi >= 2147483648L, (hi - 4294967296L) * 4294967296L + lo)
      .otherwise(hi * 4294967296L + lo)
  }

  /** Rolling polynomial fingerprint of the token stream (base-31 over a
    * Mersenne-prime modulus) — an order-sensitive complement to the
    * set-based md5 fingerprint. Engine-portable integer arithmetic:
    * acc < 2^31 and hash < 2^32, so acc*31 + hash < 2^37 never
    * approaches Long overflow (ANSI-safe). `tokenHash` defaults to the
    * fast crc32; pass [[portableTokenHash32]] for a cross-engine-stable
    * fingerprint. */
  def rollingHash(
      c: Column,
      tokenHash: Column => Column = t => crc32(t.cast("binary"))): Column =
    aggregate(
      tokens(c),
      lit(0L),
      (acc, t) => pmod(acc * lit(31L) + tokenHash(t), lit(2147483647L)))

  // ------------------------------------------------------------------
  // PII scrubbing — pattern-family redaction for training corpora.
  // The patterns avoid constructs where Java regex and RE2 diverge
  // (no backrefs, no lookaround), so redaction counts and redacted
  // text are oracle-checkable cross-engine.

  /** (name, pattern, replacement) redaction rules. Order matters:
    * emails first, so a phone-like digit run inside an address is
    * consumed by the email rule, never double-redacted. */
  val PiiRules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\b555-[0-9]{4}\\b", "<PHONE>"),
    ("ipv4", "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"))

  /** Replace every PII match with its rule's placeholder — one chained
    * `regexp_replace` per rule, all codegen'd built-ins, map-only: the
    * shape a full-corpus scrub needs at 100 TB (no shuffle, no state,
    * no driver round-trips). */
  def redactPii(c: Column, rules: Seq[(String, String, String)] = PiiRules): Column =
    rules.foldLeft(c) { case (acc, (_, re, repl)) =>
      regexp_replace(acc, lit(re), lit(repl))
    }

  /** Per-rule match count (audit/reporting side of the scrub). Counts
    * run over the same progressive redaction as [[redactPii]], so a
    * span consumed by an earlier rule is never counted twice. */
  def piiCounts(c: Column, rules: Seq[(String, String, String)] = PiiRules): Seq[(String, Column)] = {
    val (_, counts) = rules.foldLeft((c, Seq.empty[(String, Column)])) {
      case ((acc, out), (name, re, repl)) =>
        (regexp_replace(acc, lit(re), lit(repl)),
          out :+ (name, regexp_count(acc, lit(re))))
    }
    counts
  }

  /** Spark/DuckDB string order: unsigned byte-wise UTF-8 comparison —
    * the HOUSE order for any driver-side sort that an engine replays.
    * JVM `String.compareTo` is UTF-16 code-unit order, which disagrees
    * beyond the BMP (supplementary-plane characters sort before
    * U+E000..U+FFFF in UTF-16 code units but after in UTF-8 bytes), so
    * a driver tier sorting with the default `String` ordering could
    * hash-mismatch an engine-ordered oracle on exotic keys. */
  def utf8Compare(x: String, y: String): Int = {
    val xb = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val yb = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(xb.length, yb.length)
    while (i < n) {
      val c = (xb(i) & 0xff) - (yb(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    xb.length - yb.length
  }

  /** [[utf8Compare]] as an `Ordering[String]` for `sortBy`/`sorted`. */
  val Utf8Ordering: Ordering[String] =
    (x: String, y: String) => utf8Compare(x, y)
}
