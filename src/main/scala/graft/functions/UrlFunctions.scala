package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization toolkit — the stage-0 operators of a web
  * corpus: every crawl pipeline keys its FIRST dedup pass and its
  * mixture controls on normalized URLs and registered domains, long
  * before any text fingerprint is computed (the same raw page arrives
  * as `HTTP://Site.com:80/a/?utm_source=feed#top` and
  * `http://site.com/a` — byte-distinct, one document).
  *
  * Everything here is a MAP-ONLY codegen'd expression chain — no
  * shuffle, no UDF, no driver round trip — built exclusively from
  * string/regexp/array primitives whose semantics Spark and the
  * DuckDB oracle share bit-for-bit (the regexes use only the
  * RE2 ∩ java.util.regex common subset: character classes,
  * alternation, non-capturing groups, anchors — no lookaround, no
  * backreferences). That is also why this is NOT built on Spark's
  * `parse_url`: one precompiled regex pass extracts all components
  * (parse_url re-parses per component), and the identical pattern
  * strings replay verbatim in the oracle SQL.
  *
  * Reference context: ONSdigital/ons-utils has no URL operator; this
  * family is part of the training-data-pipeline surface the engine
  * adds beyond the reference (web-corpus dedup keying).
  *
  * At 100 TB these expressions ride the scan inside
  * WholeStageCodegen; the downstream dedup
  * ([[graft.operators.Dedup.exactDedupIds]]) then shuffles ONLY the
  * (normalized-url, id) pairs with map-side-combined mins. */
object UrlFunctions {

  /** One-pass URL shape: scheme `://` authority path [?query]
    * [#fragment]. Group 1 scheme, 2 authority, 3 path, 4 query (no
    * `?`), fragment discarded. Non-matching input → every group reads
    * `''` on both engines (the loud "not a URL" signal
    * [[urlNormalize]] turns into NULL). */
  private[graft] val UrlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"

  /** Host out of an authority: drop userinfo up to the LAST `@` (the
    * RFC rule — `a@b@evil.com` is userinfo `a@b`, host `evil.com`,
    * the classic open-redirect/dedup-bypass trick), keep a bracketed
    * IPv6 literal whole (its colons are not a port separator). */
  private[graft] val HostRe = "^(?:.*@)?(\\[[^\\]]*\\]|[^:]*)"

  /** Explicit port at the END of an authority (a bracketed IPv6 host
    * without a port ends in `]`, so it cannot false-match). */
  private[graft] val PortRe = ":([0-9]+)$"

  /** Last dot-separated label (the fallback "suffix" when no
    * public-suffix rule matches — the PSL `*` prevailing rule). */
  private[graft] val LastLabelRe = "([^.]*)$"

  /** The tracking parameters every major analytics stack appends —
    * the default `stripParams` for [[urlNormalize]]. Callers with
    * their own telemetry vocabulary pass their own list. */
  val DefaultTrackingParams: Seq[String] = Seq(
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "gclid", "fbclid", "msclkid", "mc_eid", "igshid")

  def urlNormalize(url: Column): Column =
    urlNormalize(url, DefaultTrackingParams)

  /** Canonical form of an absolute URL, NULL for anything that is not
    * one (and NULL in, NULL out). The rules, in order:
    *
    *  - scheme and host lowercase (IDN note: a punycode `xn--` host
    *    is ASCII and passes through verbatim — homoglyph folding is
    *    out of scope, so `xn--pple-43d.com` stays DISTINCT from
    *    `apple.com`, never silently merged);
    *  - userinfo dropped (everything up to the last `@` — identity
    *    is never dedup-relevant and is the standard phishing bypass);
    *  - an explicit port re-emitted NUMERICALLY (`:0080` → `:80`),
    *    and dropped entirely when it is the scheme default
    *    (http:80, https:443);
    *  - trailing slashes stripped from the path, an empty path
    *    becoming `/` (so `http://a.com`, `http://a.com/`,
    *    `http://a.com//` all read `http://a.com/`);
    *  - query parameters split on `&`, empties dropped, any whose
    *    NAME (the part before the first `=`, compared lowercase)
    *    is in `stripParams` dropped, the survivors sorted by their
    *    full `name=value` bytes and rejoined — param order never
    *    splits a dedup key; a query left empty loses its `?`;
    *  - the fragment dropped (client-side only).
    *
    * Percent-encoding is preserved byte-for-byte (decoding can change
    * which URL a server resolves; canonicalizing it is not safe). */
  def urlNormalize(url: Column, stripParams: Seq[String]): Column = {
    val stripLower = stripParams.map(_.toLowerCase).distinct
    val scheme = lower(regexp_extract(url, UrlRe, 1))
    val auth = regexp_extract(url, UrlRe, 2)
    val path0 = regexp_extract(url, UrlRe, 3)
    val query0 = regexp_extract(url, UrlRe, 4)

    val host = lower(regexp_extract(auth, HostRe, 1))
    val portS = regexp_extract(auth, PortRe, 1)
    // lazy CaseWhen guards the ANSI-fatal cast of '' to a number;
    // the <= 9-digit bound — applied AFTER stripping leading zeros, so
    // a zero-padded valid port (`:0000000080`) still normalizes —
    // keeps an adversarial digit run (crawl data:
    // `http://a.com:9999999999999999999/x`) from overflowing the cast:
    // such a "port" is not a port, so it is dropped, and the oracle
    // mirrors the same strip+length rule (never TRY_CAST, which would
    // differ at 10-18 significant digits)
    val portN = when(portS =!= "" &&
      length(regexp_replace(portS, "^0+", "")) <= 9, portS.cast("long"))
    val isDefault = (scheme === "http" && portN === 80L) ||
      (scheme === "https" && portN === 443L)
    val hostPort = concat(host,
      when(portN.isNotNull && !isDefault,
        concat(lit(":"), portN.cast("string"))).otherwise(lit("")))

    val deslashed = regexp_replace(path0, "/+$", "")
    val path = when(deslashed === "", lit("/")).otherwise(deslashed)

    val kept = filter(split(query0, "&"), p =>
      p =!= "" && (if (stripLower.isEmpty) lit(true)
        else !lower(regexp_extract(p, "^([^=]*)", 1))
          .isin(stripLower: _*)))
    val query = array_join(array_sort(kept), "&")

    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), hostPort, path,
        when(query =!= "", concat(lit("?"), query)).otherwise(lit(""))))
  }

  /** The lowercase host of an absolute URL (same component regexes as
    * [[urlNormalize]]) — `''` when the input is not URL-shaped. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(regexp_extract(url, UrlRe, 2), HostRe, 1))

  /** Registered (pay-level) domain of a hostname against a
    * CALLER-SUPPLIED public-suffix list — the per-site rollup key of
    * every crawl mixture report. The list rides the plan as ONE array
    * literal (a broadcast-free map-only probe: even the full ~10k-rule
    * public suffix list is a few hundred KB of plan constant, shipped
    * once per executor inside the serialized plan, never a join).
    *
    * Semantics (the PSL algorithm over exact rules):
    *  - the LONGEST listed suffix that matches `host` as a whole
    *    label sequence (`host == s` or `host` ends with `"." + s`)
    *    is the effective suffix — so with both `uk` and `co.uk`
    *    listed, `shop.example.co.uk` → suffix `co.uk`;
    *  - no listed suffix matching falls back to the PSL prevailing
    *    `*` rule: the last label is the suffix;
    *  - the registered domain is the label immediately left of the
    *    suffix plus the suffix (`example.co.uk`); a host that IS a
    *    suffix (or is empty) has no registrable part → NULL.
    *
    * Hosts are lowercased first; `suffixes` must already be
    * lowercase, dot-trimmed labels (checked loudly at plan build).
    * Longest-match runs as filter → length-tagged `array_max` (a
    * fixed-width `lpad` length tag makes lexicographic max equal
    * numeric-longest on both engines — deterministic ties by bytes). */
  def registeredDomain(host: Column, suffixes: Seq[String]): Column = {
    require(suffixes.nonEmpty, "registeredDomain: empty suffix list")
    suffixes.foreach { s =>
      require(s.nonEmpty && s == s.toLowerCase && !s.startsWith(".") &&
        !s.endsWith(".") && s.length <= 255,
        s"registeredDomain: suffix '$s' must be a non-empty lowercase " +
          "dot-trimmed label sequence (<= 255 chars)")
    }
    val h = lower(host)
    val sufArr = array(suffixes.distinct.sorted.map(lit): _*)
    val matches = filter(sufArr, s =>
      h === s || h.endsWith(concat(lit("."), s)))
    val best = array_max(transform(matches, s =>
      concat(lpad(length(s).cast("string"), 4, "0"), lit(":"), s)))
    val eff = coalesce(best.substr(lit(6), length(best)),
      regexp_extract(h, LastLabelRe, 1))
    val preLen = length(h) - length(eff) - 1
    val prefix = when(preLen > 0, h.substr(lit(1), preLen))
      .otherwise(lit(""))
    val lastLabel = regexp_extract(prefix, LastLabelRe, 1)
    when(h === eff || lastLabel === "", lit(null).cast("string"))
      .otherwise(concat(lastLabel, lit("."), eff))
  }
}
