"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure Catalyst expressions (split/regexp/md5/higher-order functions) —
single-pass, no shuffle, no Python — so each operator is a per-row
projection that runs at scan speed on any corpus size.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from json_schema_spark.textops.dedup import tokens

# Small high-frequency stopword lists (public knowledge). Order defines
# the deterministic tie-break: first language with the max hit count wins.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "por"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein",
           "zu"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que",
           "pour"],
}


def stopword_hits(col: Column, words: list[str]) -> Column:
    """Token hits (with multiplicity) against a stopword list."""
    lit_words = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(F.lower(col)),
                           lambda t: F.array_contains(lit_words, t)))


def language_id(col: Column) -> Column:
    """Heuristic n-gram/stopword language ID: argmax of stopword hits,
    'und' (undetermined) when no list scores a hit."""
    scores = {lang: stopword_hits(col, words)
              for lang, words in STOPWORDS.items()}
    langs = list(STOPWORDS.keys())
    # when-chain in declaration order: the first language whose score is
    # positive and >= every other score wins (first-max tie-break)
    expr = None
    for lang in langs:
        cond = scores[lang] > 0
        for other in langs:
            if other != lang:
                cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, F.lit(lang)) if expr is None \
            else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def subword_count(col: Column) -> Column:
    """BPE-ish unit count: alphanumeric runs + isolated punctuation —
    a cheap stand-in for a real tokenizer's piece count."""
    return F.coalesce(
        F.regexp_count(col, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")),
        F.lit(0))


def quality_features(col: Column) -> dict[str, Column]:
    n_chars = F.length(col)
    n_tokens = token_count(col)
    n_punct = F.coalesce(F.regexp_count(col, F.lit(r"[.,;:!?]")), F.lit(0))
    n_alpha = F.coalesce(F.regexp_count(col, F.lit(r"[A-Za-z]")), F.lit(0))
    n_stop = stopword_hits(col, STOPWORDS["en"])
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": F.when(
            n_chars > 0, n_punct.cast("double") / n_chars.cast("double"))
            .otherwise(F.lit(0.0)),
        "alpha_ratio": F.when(
            n_chars > 0, n_alpha.cast("double") / n_chars.cast("double"))
            .otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(
            n_tokens > 0, n_stop.cast("double") / n_tokens.cast("double"))
            .otherwise(F.lit(0.0)),
    }


def quality_score(col: Column) -> Column:
    """[0,1] heuristic quality score from length / alpha / stopword
    signals — linear blend with clamped length term; arithmetic only
    (+,*,/), so oracle engines reproduce it exactly."""
    f = quality_features(col)
    length_term = F.least(f["n_tokens"].cast("double") / F.lit(100.0),
                          F.lit(1.0))
    score = (F.lit(0.4) * length_term
             + F.lit(0.3) * f["alpha_ratio"]
             + F.lit(0.3) * F.least(f["stopword_ratio"] * 2, F.lit(1.0)))
    return F.round(score, 6)


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of casefolded, whitespace-collapsed text
    — the digest exact dedup groups on."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def repetition_features(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", §A1.1 repetition filters):
    - dup_token_ratio: 1 - distinct_tokens/total_tokens;
    - top_bigram_frac: occurrences of the most frequent bigram over
      total bigrams (boilerplate/spam markers).

    Shape: tokens explode once; bigrams come from a doc-partitioned
    lead() window (each bigram string materialized once — the
    zip-with-slice HOF form re-evaluates per element); one groupBy per
    doc per bigram, one per doc. Shuffles carry counts, not text.
    """
    col = F.col(text_col)
    toks = (df.filter(col.isNotNull())
            .select(F.col(id_col),
                    F.posexplode(tokens(F.lower(col))).alias("pos", "t")))
    from pyspark.sql import Window as W

    nxt = F.lead("t").over(W.partitionBy(id_col).orderBy("pos"))
    bigrams = (toks.withColumn("_nxt", nxt)
               .filter(F.col("_nxt").isNotNull())
               .withColumn("bg", F.concat_ws(" ", F.col("t"),
                                             F.col("_nxt"))))
    bg_counts = (bigrams.groupBy(id_col, "bg")
                 .agg(F.count(F.lit(1)).alias("n")))
    bg_stats = (bg_counts.groupBy(id_col)
                .agg(F.max("n").alias("top_bg"),
                     F.sum("n").alias("total_bg")))
    tok_stats = (toks.groupBy(id_col)
                 .agg(F.count(F.lit(1)).alias("n_tokens"),
                      F.count_distinct("t").alias("n_distinct")))
    joined = tok_stats.join(bg_stats, id_col, "left")
    dup_ratio = F.when(
        F.col("n_tokens") > 0,
        1 - F.col("n_distinct").cast("double")
        / F.col("n_tokens").cast("double")).otherwise(F.lit(0.0))
    top_bg_frac = F.when(
        F.coalesce(F.col("total_bg"), F.lit(0)) > 0,
        F.col("top_bg").cast("double")
        / F.col("total_bg").cast("double")).otherwise(F.lit(0.0))
    return joined.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.round(dup_ratio, 6).alias("dup_token_ratio"),
        F.round(top_bg_frac, 6).alias("top_bigram_frac"))


def quality_filter(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_tokens: int = 10,
                   min_alpha_ratio: float = 0.5,
                   min_quality: float = 0.2) -> DataFrame:
    """C4-style heuristic quality gate composed from analyze():
    keep documents with enough tokens, mostly-alphabetic text, and a
    quality score above threshold. Returns (id, kept reason-free) —
    the projection composes into any pipeline without extra scans."""
    feats = analyze(df, text_col, id_col)
    return (feats.filter((F.col("n_tokens") >= min_tokens)
                         & (F.col("alpha_ratio") >= min_alpha_ratio)
                         & (F.col("quality") >= min_quality))
            .select(F.col(id_col), "n_tokens", "quality"))


def lang_agreement(df: DataFrame, url_col: str = "url",
                   html_col: str = "html",
                   text_col: str = "text") -> DataFrame:
    """Declared-vs-detected language agreement per host: documents
    whose <html lang> attribute disagrees with the detected language
    of their text are the classic machine-translation / scraped-spam
    / template-misconfiguration signal (a host declaring 'en' while
    serving detected-'fr' text wholesale is NOT an English corpus
    source). Per host: n_docs, n_declared (pages carrying a lang
    attribute), n_agree (declared PRIMARY subtag — 'en-US' -> 'en' —
    equals language_id(text)), agree_frac =
    round(n_agree / n_declared, 6) (NULL when nothing declares).

    Plan: one projection (lang regex + stopword-hit language ID, all
    codegen'd) + ONE host-keyed aggregate of integer counters — the
    host_quality shape. Zero Python."""
    from json_schema_spark.textops.html import _HTML_LANG_RX
    from json_schema_spark.textops.urls import host_of

    declared = F.lower(
        F.regexp_extract(F.col(html_col), _HTML_LANG_RX, 1))
    primary = F.element_at(F.split(declared, "-"), 1)
    staged = (df.filter(F.col(url_col).isNotNull())
              .select(host_of(F.col(url_col)).alias("host"),
                      declared.alias("_decl"),
                      primary.alias("_prim"),
                      language_id(F.col(text_col)).alias("_det"))
              .filter(F.col("host") != ""))
    agg = (staged.select(
        "host",
        (F.col("_decl") != "").cast("int").alias("_hd"),
        ((F.col("_decl") != "") & (F.col("_prim") == F.col("_det")))
        .cast("int").alias("_ag"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("_hd").alias("n_declared"),
             F.sum("_ag").alias("n_agree")))
    return agg.select(
        "host", "n_docs", "n_declared", "n_agree",
        F.when(F.col("n_declared") > 0,
               F.round(F.col("n_agree") / F.col("n_declared"), 6))
        .alias("agree_frac"))


# Unicode hygiene: invisible formatting chars (zero-widths, word
# joiner, BOM, soft hyphen) and non-whitespace C0 controls + DEL.
# \x{...} hex classes are the Java/RE2 common subset (no \uXXXX).
ZERO_WIDTH_RX = r"[\x{200B}-\x{200D}\x{2060}\x{FEFF}\x{00AD}]"
CONTROL_RX = r"[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}\x{7F}]"


def clean_unicode(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Unicode text hygiene — the normalization pass a crawl corpus
    runs before ANY hashing or dedup (the same logical text arrives
    NFC- and NFD-encoded from different CMSes, and byte-level digests
    treat them as different documents):

    1. NFC-normalize (composed forms; ligatures/fullwidth untouched —
       NFC, not NFKC, so no lossy compatibility folding);
    2. strip invisible formatting chars (zero-widths, word joiner,
       BOM, soft hyphen) — SEO spam and copy-paste artifacts that
       break tokenizers and salt n-grams;
    3. strip non-whitespace C0 controls + DEL.

    Output: (id, text, n_zero_width, n_control) — counts are exact
    length deltas so pipelines can flag invisible-char spam
    (a document with thousands of zero-widths is adversarial).

    Plan: NFC is the sanctioned Arrow-batched pandas UDF (Spark has
    no built-in normalizer; DuckDB's nfc_normalize replays it in the
    oracle — agreement verified over combining sequences, Hangul
    jamo, ligatures and fullwidth forms); the strips and counts are
    pure codegen'd regex projections. Zero shuffle."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata
        return s.map(lambda x: unicodedata.normalize("NFC", x)
                     if x is not None else None)

    # each stage materializes its string ONCE as an attribute the
    # next select references twice (value + length delta) — a
    # multi-referenced attribute survives CollapseProject, a repeated
    # expression would run the regex per reference
    s1 = df.select(F.col(id_col), _nfc(F.col(text_col)).alias("_nfc"))
    s2 = s1.select(
        id_col, "_nfc",
        F.regexp_replace(F.col("_nfc"), ZERO_WIDTH_RX, "")
        .alias("_nozw"))
    s3 = s2.select(
        id_col, "_nozw",
        (F.length("_nfc") - F.length("_nozw")).alias("n_zero_width"),
        F.regexp_replace(F.col("_nozw"), CONTROL_RX, "")
        .alias("_clean"))
    return s3.select(
        id_col, F.col("_clean").alias(text_col), "n_zero_width",
        (F.length("_nozw") - F.length("_clean")).alias("n_control"))


# demo blocklist for wordlist_filter — spam-market terms, stand-ins
# for the operational lists real pipelines ship (C4's badwords list,
# ad/affiliate vocabularies). Lowercase single tokens.
SPAM_WORDS = ("casino", "viagra", "xxx", "jackpot", "gambling",
              "lottery", "pills")


def wordlist_filter(df: DataFrame, words: tuple[str, ...] = SPAM_WORDS,
                    text_col: str = "text",
                    id_col: str = "doc_id",
                    max_hits: int = 0) -> DataFrame:
    """C4-style blocklist gate: per document, the number of TOKENS
    matching a blocklist (whole-token equality after lowercasing —
    substring probes would flag 'classics' for 'ass'-type entries,
    the classic blocklist false positive), plus the keep verdict
    ``n_blocked <= max_hits``. C4 dropped any page with a single
    bad-word hit (max_hits=0); gentler pipelines allow a budget.

    Output: (id, n_blocked, n_tokens, kept). The caller filters on
    ``kept`` or reweighs by the ratio — returning the verdict instead
    of pre-filtering keeps the gate composable with audit ledgers.

    Plan: one tokenize + one exists/filter HOF over the token array
    against a constant array literal (right for lists up to ~10^4;
    beyond that explode + broadcast-join a word table). Zero shuffle,
    zero Python; the token array materializes once as an attribute
    (CollapseProject rule)."""
    if not words:
        raise ValueError("words must be non-empty")
    wl = F.array(*[F.lit(w.lower()) for w in words])
    staged = df.select(
        F.col(id_col),
        F.transform(tokens(F.col(text_col)), F.lower).alias("_toks"))
    hits = F.size(F.filter(
        F.col("_toks"), lambda t: F.array_contains(wl, t)))
    return (staged
            .select(id_col, hits.alias("n_blocked"),
                    F.size("_toks").alias("n_tokens"))
            .withColumn("kept", F.col("n_blocked") <= max_hits))


# lowercase literal phrases probed with contains() — the classic
# soft-404 battery (error pages served with HTTP 200, which a crawler
# cannot tell apart by status code). Literals, not regexes: both
# engines do a plain substring probe, no dialect surface at all.
SOFT404_PHRASES = (
    "page not found", "404 not found", "error 404", "404 error",
    "does not exist", "no longer available", "page you requested",
    "page has been removed", "could not be found", "access denied",
    "temporarily unavailable", "nothing was found",
)


def soft404_flags(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  max_chars: int = 500) -> DataFrame:
    """Soft-404 / error-page detection: pages that SAY they are
    errors while returning HTTP 200 — a real crawl's second-largest
    junk class after boilerplate mills. Per document:
    ``n_error_phrases`` (how many battery phrases the lowercased text
    contains), ``n_chars``, and ``is_soft404`` = at least one phrase
    AND short (< max_chars) — the length gate keeps a long article
    that merely QUOTES 'page not found' out of the junk pile.

    Plan: one projection — a constant chain of substring probes over
    one lowercase() — zero shuffle, zero Python, fully codegen'd;
    composes with quality_filter in the same scan."""
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    hits = sum((t.contains(p).cast("int") for p in SOFT404_PHRASES),
               F.lit(0))
    return df.select(
        F.col(id_col),
        hits.alias("n_error_phrases"),
        F.length(t).alias("n_chars"),
        ((hits > 0) & (F.length(t) < max_chars)).alias("is_soft404"))


def analyze(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Full text-analysis pass: two stacked projections, zero shuffle.

    Stage 1 computes every per-doc feature ONCE as a named attribute:
    char-level counts (length/punct/alpha/subwords/fingerprint) and the
    five token aggregates (n_tokens + one stopword-hit count per
    language, each a single size(filter(tokens, ...)) HOF). Stage 2
    derives the argmax when-chain and ratios from those attributes.

    Why this exact shape (both alternatives measured at sf0.1):
    - single-projection form: the when-chain repeats each hit count ~5x
      and Catalyst re-evaluates the tokenize+filter per occurrence
      (no CSE across HOF lambda bodies) — ~10x slower;
    - explode+groupBy form: CollapseProject/ColumnPruning float the
      char-feature expressions ABOVE the Generate, so regexp/md5 over
      the full text re-run per TOKEN row (O(n_tokens x doc_len)) —
      ~10x slower AND it shuffles.
    Two stacked selects survive optimization intact because
    CollapseProject refuses to inline non-cheap expressions referenced
    more than once: each feature stays evaluated once per document, the
    plan is Project/Project/Scan, stays in one WholeStageCodegen span,
    and needs no exchange at any corpus size.
    """
    col = F.col(text_col)
    toks = tokens(F.lower(col))

    def _hits(lang: str) -> Column:
        lw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(lw, t)))

    agg = (df.filter(col.isNotNull())
           .select(F.col(id_col),
                   F.length(col).alias("_n_chars"),
                   F.coalesce(F.regexp_count(col, F.lit(r"[.,;:!?]")),
                              F.lit(0)).alias("_n_punct"),
                   F.coalesce(F.regexp_count(col, F.lit(r"[A-Za-z]")),
                              F.lit(0)).alias("_n_alpha"),
                   subword_count(col).alias("_n_subwords"),
                   fingerprint(col).alias("_fingerprint"),
                   F.size(toks).cast("long").alias("n_tokens"),
                   *[_hits(lang).cast("long").alias(f"_hits_{lang}")
                     for lang in STOPWORDS]))

    hits = {lang: F.col(f"_hits_{lang}") for lang in STOPWORDS}
    langs = list(STOPWORDS.keys())
    lang_expr = None
    for lang in langs:
        cond = hits[lang] > 0
        for other in langs:
            if other != lang:
                cond = cond & (hits[lang] >= hits[other])
        lang_expr = F.when(cond, F.lit(lang)) if lang_expr is None \
            else lang_expr.when(cond, F.lit(lang))
    lang_expr = lang_expr.otherwise(F.lit("und"))

    n_chars = F.col("_n_chars")
    n_tokens = F.col("n_tokens")
    n_punct = F.col("_n_punct")
    n_alpha = F.col("_n_alpha")
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double")
                         / n_chars.cast("double")).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, n_alpha.cast("double")
                         / n_chars.cast("double")).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, hits["en"].cast("double")
                        / n_tokens.cast("double")).otherwise(F.lit(0.0))
    length_term = F.least(n_tokens.cast("double") / F.lit(100.0),
                          F.lit(1.0))
    quality = F.round(F.lit(0.4) * length_term
                      + F.lit(0.3) * alpha_ratio
                      + F.lit(0.3) * F.least(stop_ratio * 2, F.lit(1.0)),
                      6)
    return agg.select(
        F.col(id_col),
        lang_expr.alias("lang_pred"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.col("_n_subwords").alias("n_subwords"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        quality.alias("quality"),
        F.col("_fingerprint").alias("fingerprint"))


def boilerplate_lines(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      min_docs: int = 2) -> DataFrame:
    """(line, n_docs): trimmed non-empty lines appearing in at least
    ``min_docs`` DISTINCT documents — the CCNet-style paragraph-level
    dedup signal (Wenzek et al. 2020 deduplicate at paragraph level
    before LM filtering; headers/footers/cookie banners dominate this
    set on web text). One explode + one distinct-count hash aggregate;
    partial aggregation collapses each task to its distinct
    (line, doc) pairs before the shuffle."""
    lines = (df.filter(F.col(text_col).isNotNull())
             .select(F.col(id_col).alias("_id"),
                     F.explode(F.split(F.col(text_col), "\n"))
                     .alias("_raw"))
             .select("_id", F.trim(F.col("_raw")).alias("line"))
             .filter(F.col("line") != ""))
    return (lines.groupBy("line")
            .agg(F.count_distinct("_id").alias("n_docs"))
            .filter(F.col("n_docs") >= min_docs))


def host_quality(df: DataFrame, url_col: str = "url",
                 text_col: str = "text",
                 min_tokens: int = 10,
                 min_alpha_ratio: float = 0.5,
                 min_quality: float = 0.2) -> DataFrame:
    """Per-host quality prior: (host, n_docs, n_kept, keep_rate,
    n_unique_texts, dup_frac, total_tokens, avg_tokens) — the host
    score a crawl scheduler combines with PageRank to decide recrawl
    priority. keep_rate is the fraction of the host's documents
    passing the C4-style quality_filter gates; dup_frac is the
    fingerprint-level duplication rate (host_profile's signal but on
    the casefolded whitespace-collapsed fingerprint, so trivial
    reformatting still counts as a dup).

    Every aggregate is an INTEGER count/sum — ratios are one double
    division of two exact longs, rounded once — so the result is
    bit-identical regardless of aggregation order (a float avg of
    per-doc scores would be order-dependent across engines and
    partitionings). One projection (analyze's two stacked selects,
    keyed by host instead of doc id) + ONE hash aggregate; skew story
    matches host_profile: constant per-group state, count_distinct
    collapses (host, fingerprint) map-side. NULL-text documents are
    not profiled (analyze drops them), matching quality_filter."""
    from json_schema_spark.textops.urls import host_of

    host = host_of(F.col(url_col))
    base = (df.filter(F.col(url_col).isNotNull())
            .select(host.alias("_host"), F.col(text_col))
            .filter(F.col("_host") != ""))
    feats = analyze(base, text_col, id_col="_host")
    kept = ((F.col("n_tokens") >= min_tokens)
            & (F.col("alpha_ratio") >= min_alpha_ratio)
            & (F.col("quality") >= min_quality))
    return (feats
            .groupBy(F.col("_host").alias("host"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(kept.cast("long")).alias("n_kept"),
                 F.count_distinct("fingerprint")
                 .alias("n_unique_texts"),
                 F.sum("n_tokens").alias("total_tokens"))
            .select(
                "host", "n_docs", "n_kept",
                F.round(F.col("n_kept") / F.col("n_docs"), 6)
                .alias("keep_rate"),
                "n_unique_texts",
                F.round(F.lit(1.0) - F.col("n_unique_texts")
                        / F.col("n_docs"), 6).alias("dup_frac"),
                "total_tokens",
                F.round(F.col("total_tokens") / F.col("n_docs"), 6)
                .alias("avg_tokens")))


def host_boilerplate_lines(df: DataFrame, url_col: str = "url",
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           min_docs: int = 3,
                           min_frac: float = 0.5) -> DataFrame:
    """Host-SCOPED boilerplate: (host, line, n_docs, host_docs,
    doc_frac) for trimmed lines appearing in >= ``min_frac`` of a
    host's documents (hosts with >= ``min_docs`` pages). Boilerplate
    is host-local on the real web — one site's nav menu, cookie
    banner and footer repeat on EVERY page of that site but nowhere
    else, so a global frequency threshold (boilerplate_lines) misses
    them on small hosts and over-fires on common short sentences; the
    per-host fraction is the CCNet/trafilatura-style signal for
    main-content extraction.

    Plan: explode lines -> distinct-count aggregate keyed on
    (host, line) + a per-host doc-count aggregate, joined on host.
    The host-docs side is one row per host (several orders smaller
    than the corpus) and joins broadcast-eligible — left unhinted so
    AQE picks broadcast when it fits and degrades to shuffle when a
    10^9-host crawl does not. Skew: the (host, line) key subdivides a
    hot host by its distinct lines, and the per-group state is a
    constant-size count, so a 10^7-page host costs merge time only."""
    from json_schema_spark.textops.urls import host_of

    host = host_of(F.col(url_col))
    base = (df.filter(F.col(url_col).isNotNull()
                      & F.col(text_col).isNotNull())
            .select(host.alias("host"), F.col(id_col).alias("_id"),
                    F.col(text_col).alias("_t"))
            .filter(F.col("host") != ""))
    host_docs = (base.groupBy("host")
                 .agg(F.count_distinct("_id").alias("host_docs"))
                 .filter(F.col("host_docs") >= min_docs))
    lines = (base
             .select("host", "_id",
                     F.explode(F.split(F.col("_t"), "\n")).alias("_raw"))
             .select("host", "_id", F.trim(F.col("_raw")).alias("line"))
             .filter(F.col("line") != ""))
    per_line = (lines.groupBy("host", "line")
                .agg(F.count_distinct("_id").alias("n_docs")))
    return (per_line.join(host_docs, "host")
            .withColumn("doc_frac",
                        F.round(F.col("n_docs") / F.col("host_docs"), 6))
            .filter(F.col("doc_frac") >= min_frac)
            .select("host", "line", "n_docs", "host_docs", "doc_frac"))


def remove_boilerplate_lines(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id",
                             min_docs: int = 2,
                             out_col: str = "text_clean") -> DataFrame:
    """Documents with boilerplate lines stripped: every line whose
    TRIMMED form occurs in >= ``min_docs`` distinct documents is
    removed (empty lines are kept — they carry structure, not
    boilerplate); remaining lines rejoin in original order.

    The boilerplate set rides a single-row broadcast (collect_set) onto
    the documents, and removal is a pure array filter — one shuffle
    total (the distinct-count aggregate). The set is lines ABOVE the
    frequency threshold, which on web corpora is tiny relative to the
    corpus; if a pathological corpus makes it exceed broadcast budgets,
    raise min_docs or switch to the explode + broadcast-anti-join form
    (same semantics, data-sized instead of set-sized build)."""
    bl = (boilerplate_lines(df, text_col, id_col, min_docs)
          .agg(F.collect_set("line").alias("_bl")))
    t = F.col(text_col)
    cleaned = F.array_join(
        F.filter(F.split(t, "\n"),
                 lambda x: (F.trim(x) == "")
                 | ~F.array_contains(F.col("_bl"), F.trim(x))),
        "\n")
    return (df.crossJoin(F.broadcast(bl))
            .withColumn(out_col,
                        F.when(t.isNotNull(), cleaned))
            .drop("_bl"))


def bm25_topk(df: DataFrame, query_terms: list[str],
              text_col: str = "text", id_col: str = "doc_id",
              k: int = 10, k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query under BM25
    (Robertson/Spärck Jones; the Okapi formula Lucene/Elasticsearch
    default to) — corpus search without an index service, the "find
    me docs about X" primitive corpus exploration and eval-set
    mining want. Per doc: sum over query terms of
    idf(t) * tf / (tf + k1 * (1 - b + b * len/avglen)), with the
    standard smoothed idf = ln(1 + (N - df + 0.5) / (df + 0.5)).

    Plan: ONE token explode feeds doc lengths, per-(doc, term) tf for
    the query terms only (filter BEFORE the aggregate — the explode
    carries the whole corpus but the tf table is bounded by
    n_query_terms x n_docs), and df per term; N and avgdl ride a
    one-row broadcast. Ranking runs on the 6-dp-rounded score with id
    tie-break (engine-reproducible boundary, same discipline as
    tfidf_topk). Returns (id, score, rank) for the top k; documents
    matching no term score 0 and are excluded."""
    from json_schema_spark.cache import register_cache
    from pyspark.sql import Window as W

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    toks = register_cache(
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col),
                F.explode(tokens(F.lower(F.col(text_col)))).alias("t")))
    lens = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    totals = lens.agg(F.count(F.lit(1)).alias("N"),
                      F.avg("dl").alias("avgdl"))
    qtf = (toks.filter(F.col("t").isin(terms))
           .groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf")))
    dft = qtf.groupBy("t").agg(F.count(F.lit(1)).alias("df_t"))
    scored = (qtf.join(dft, "t")
              .join(lens, id_col)
              .crossJoin(F.broadcast(totals))
              .withColumn("_idf", F.log(
                  1.0 + (F.col("N") - F.col("df_t") + 0.5)
                  / (F.col("df_t") + 0.5)))
              .withColumn("_s", F.col("_idf") * F.col("tf")
                          / (F.col("tf") + k1 * (1.0 - b
                             + b * F.col("dl") / F.col("avgdl")))))
    win = W.partitionBy().orderBy(F.col("score").desc(), F.col(id_col))
    return (scored.groupBy(id_col)
            .agg(F.round(F.sum("_s"), 6).alias("score"))
            .withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k))


def dedup_paragraphs_global(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            out_col: str = "text_clean") -> DataFrame:
    """Cross-document paragraph dedup, FIRST occurrence wins — the
    actual CCNet dedup step (Wenzek et al. 2020 hash every paragraph
    and drop repeats corpus-wide before LM filtering): unlike
    remove_boilerplate_lines (which strips frequent lines from EVERY
    doc), exactly one instance of each repeated paragraph survives,
    at the lexicographically smallest (doc, position).

    Plan: posexplode lines -> normalized paragraph digest -> one
    partial+final aggregate picks min(doc:pos key) per digest (agg,
    not a window: a boilerplate paragraph with 10^8 instances would
    single-reducer a digest-partitioned window, while the partial agg
    collapses it map-side) -> join the flag back -> one groupBy(doc)
    reassembles survivors in original order (collect_list skips the
    NULLed losers, array_sort orders by position). Two shuffles over
    paragraph rows, both on well-distributed keys.

    Returns (id, n_paragraphs, n_kept, out_col) — paragraphs are
    NON-EMPTY trimmed lines (docs with no such line drop out);
    n_paragraphs counts them, n_kept the survivors."""
    from json_schema_spark.cache import register_cache
    from json_schema_spark.textops.dedup import normalized_digest

    # the first-occurrence key is a STRUCT (id, pos): struct min is
    # field-by-field lexicographic in Spark and DuckDB alike, exact
    # for any id type — a zero-padded string key would silently
    # TRUNCATE ids longer than the pad width (lpad shortens!) and
    # mis-order negative ids
    paras = register_cache(
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("_id"),
                F.posexplode(F.split(F.col(text_col), "\n"))
                .alias("_pos", "_raw"))
        .select("_id", "_pos", F.trim(F.col("_raw")).alias("_p"))
        .filter(F.col("_p") != "")
        .select("_id", "_pos", "_p",
                normalized_digest(F.col("_p")).alias("_dg"),
                F.struct(F.col("_id"), F.col("_pos")).alias("_key")))
    firsts = paras.groupBy("_dg").agg(F.min("_key").alias("_first"))
    flagged = (paras.join(firsts, "_dg")
               .withColumn("_keep", F.col("_key") == F.col("_first")))
    kept_struct = F.when(F.col("_keep"),
                         F.struct(F.col("_pos"), F.col("_p")))
    return (flagged.groupBy("_id")
            .agg(F.count(F.lit(1)).alias("n_paragraphs"),
                 F.sum(F.when(F.col("_keep"), 1).otherwise(0))
                 .alias("n_kept"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(kept_struct)),
                         lambda s: s["_p"]), "\n").alias(out_col))
            .select(F.col("_id").alias(id_col), "n_paragraphs",
                    "n_kept", out_col))


# UTF-8-decoded-as-Latin-1 artifact sequences ("mojibake") and their
# intended characters — the high-frequency classes an ftfy-style web
# cleanup fixes (curly quotes/dashes via the 'â€' family, Latin-1
# accents via the 'Ã' family, stray NBSP markers via 'Â '). Ordered
# list: replacements apply in THIS order in both engines (plain
# literal replace — no regex), so the mapping is its own oracle spec.
MOJIBAKE_MAP: list[tuple[str, str]] = [
    ("â€™", "'"),    # â€™ -> right single quote
    ("â€œ", '"'),    # â€œ -> left double quote
    ("â€“", "–"),  # â€“ -> en dash
    ("â€”", "—"),  # â€” -> em dash
    ("â€¦", "…"),  # â€¦ -> ellipsis
    ("Ã©", "é"),     # Ã© -> é
    ("Ã¨", "è"),     # Ã¨ -> è
    ("Ã¡", "á"),     # Ã¡ -> á
    ("Ã³", "ó"),     # Ã³ -> ó
    ("Ãº", "ú"),     # Ãº -> ú
    ("Ã±", "ñ"),     # Ã± -> ñ
    ("Ã¤", "ä"),     # Ã¤ -> ä
    ("Ã¶", "ö"),     # Ã¶ -> ö
    ("Ã¼", "ü"),     # Ã¼ -> ü
    ("Ã§", "ç"),     # Ã§ -> ç
    ("Â ", " "),          # Â + NBSP -> space
    ("Â ", " "),               # Â + space -> space
]


def fix_mojibake(col: Column) -> Column:
    """Chained literal replacement of MOJIBAKE_MAP, in order — pure
    expression, zero shuffle. Not a general ftfy: only the enumerated
    high-frequency artifact classes."""
    out = col
    for bad, good in MOJIBAKE_MAP:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def encoding_artifacts(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       out_col: str = "text_fixed") -> DataFrame:
    """(id, n_artifacts, out_col): mojibake repair plus an artifact
    count on the ORIGINAL text (a quality signal on its own — docs
    with many artifacts usually have deeper encoding damage and are
    filter candidates, the cleanup C4/ftfy pipelines apply to crawl
    text). Counting uses one alternation regex over the map's keys
    (no key is a prefix of another, so leftmost-first matching is
    unambiguous in Java regex and RE2 alike); fixing uses the literal
    replace chain. Single projection, runs at scan speed."""
    rx = "|".join(bad for bad, _ in MOJIBAKE_MAP)
    t = F.col(text_col)
    return (df.filter(t.isNotNull())
            .select(F.col(id_col),
                    F.coalesce(F.regexp_count(t, F.lit(rx)), F.lit(0))
                    .alias("n_artifacts"),
                    fix_mojibake(t).alias(out_col)))


# PII patterns, restricted to constructs Java regex and RE2 interpret
# identically (no lookarounds, no backrefs) so the DuckDB oracle can
# replay them literally. Deliberately conservative: high-precision
# surface forms, not a compliance-grade detector.
PII_PATTERNS = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
              "<EMAIL>"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
             "<IP>"),
    "phone": (r"\+[0-9][0-9 ()-]{6,18}[0-9]"
              r"|\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
              "<PHONE>"),
}


def redact_pii(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id",
               out_col: str = "text_redacted") -> DataFrame:
    """Replace email / IPv4 / phone surface forms with typed
    placeholder tokens and count the hits per category:
    (id, out_col, n_email, n_ipv4, n_phone). Pure projection — chained
    regexp_replace + regexp_count, zero shuffle, codegen'd.

    Replacement order is fixed (email first), so when one category's
    match contains another's, the earlier replacement wins in the
    redacted text — e.g. "bob@example.com" redacts as one <EMAIL>
    rather than leaving a bare domain. Note the email pattern requires
    an ALPHABETIC TLD, so "a@1.2.3.4" is NOT an email match; its IP
    suffix redacts as "a@<IP>". The n_* counts are raw per-pattern
    match counts evaluated independently on the ORIGINAL text, not
    counts of inserted placeholders — for overlapping surface forms
    (a phone-like digit run inside a matched email) a category can
    count a hit whose text was consumed by an earlier replacement."""
    t = F.col(text_col)
    counts = [
        F.when(t.isNotNull(),
               F.regexp_count(t, F.lit(rx))).alias(f"n_{name}")
        for name, (rx, _) in PII_PATTERNS.items()]
    red = t
    for name, (rx, token) in PII_PATTERNS.items():
        red = F.regexp_replace(red, rx, token)
    return (df.select(F.col(id_col), *counts, red.alias(out_col)))


# GPT-2-style pre-tokenizer, lookahead-free: common English
# contractions, a letter run, a digit run, or a punctuation run — each
# optionally preceded by one space. The original GPT-2 pattern's
# `\s+(?!\S)` lookahead is dropped (RE2 has no lookahead), which only
# changes how runs of pure whitespace count — and those are excluded
# here anyway. Uses only syntax Java regex and RE2/DuckDB interpret
# identically, so the oracle replays the very same pattern.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens_ws, n_tokens_bpe): whitespace token count plus a
    BPE-ish pre-tokenizer count (BPE_PRETOKEN_RE). The pre-tokenizer
    count approximates real BPE token budgets (packing, truncation,
    cost estimates) without shipping a vocabulary — subword merges only
    ever split pre-tokens further, so it is a stable lower bound with a
    roughly constant ratio on natural text. Pure projection: both
    counts are regexp expressions, zero shuffle, codegen'd."""
    t = F.col(text_col)
    return (df.filter(t.isNotNull())
            .select(
                F.col(id_col),
                F.size(tokens(t)).alias("n_tokens_ws"),
                F.size(F.regexp_extract_all(
                    t, F.lit(BPE_PRETOKEN_RE), F.lit(0)))
                .alias("n_tokens_bpe")))


def unigram_logprob(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    vocab: DataFrame | None = None,
                    min_count: int = 1) -> DataFrame:
    """CCNet-style perplexity proxy: per-document mean negative log
    probability under a unigram model (Wenzek et al. 2020 filter
    corpora by LM perplexity; a unigram model is its SQL-expressible
    core). Low scores = typical text; high = gibberish/outliers.

    Two aggregations over one token explode: (1) corpus unigram counts
    (the "model" — pass ``vocab`` (t, n_t) to score against a reference
    corpus instead), (2) per-doc mean of -ln((n_t + 1) / (N + V)).
    Totals ride a separate one-row broadcast cross-join, so an OOV
    token (left-join miss against the model) still sees N and V and
    scores the documented add-one floor -ln(1 / (N + V)) — previously
    N/V rode the vocab join and OOV rows silently dropped out of the
    average.

    Scale story: a caller-supplied ``vocab`` is a bounded reference
    model — broadcast it. A DERIVED vocab is all distinct corpus tokens
    (billions at web scale: URLs, typos, numbers), so that join is left
    UNHINTED — Spark shuffles or, with AQE, broadcasts only when it
    measures the vocab small. ``min_count`` frequency-floors the
    derived model (the dropped long tail scores as OOV via the same
    add-one smoothing); N and V are computed AFTER flooring so the
    model is self-consistent. Returns (id, n_tokens, avg_neg_logprob).

    The token explode feeds both the derived model and the scoring
    join, so it is persisted via the shared cache registry (caller
    releases with cache.release_caches()) — without it each consumer
    re-scans and re-explodes the corpus. The scoring join output has
    exactly one row per token, so n_tokens folds into the SAME final
    aggregation as the logprob mean: one groupBy, two aggs, no extra
    join (this closed the r3 bench regression).
    """
    from json_schema_spark.cache import register_cache

    toks = register_cache(
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col),
                F.explode(tokens(F.lower(F.col(text_col))))
                .alias("t")))
    if vocab is None:
        model = toks.groupBy("t").agg(F.count(F.lit(1)).alias("n_t"))
        if min_count > 1:
            model = model.filter(F.col("n_t") >= min_count)
        join_model = model          # unhinted: size unknown, often huge
    else:
        model = vocab
        join_model = F.broadcast(vocab)
    totals = model.agg(F.sum("n_t").alias("N"),
                       F.count(F.lit(1)).alias("V"))
    scored = (toks.crossJoin(F.broadcast(totals))
              .join(join_model, "t", "left")
              .withColumn("_nlp", -F.log(
                  (F.coalesce(F.col("n_t"), F.lit(0)) + 1).cast("double")
                  / (F.col("N") + F.col("V")).cast("double"))))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.avg("_nlp"), 6).alias("avg_neg_logprob")))


def bigram_logprob(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Conditional bigram LM score per document: mean
    -ln P(w | v) over token transitions, with add-one smoothing
    P(w|v) = (c(v,w) + 1) / (c(v) + V) against the corpus-derived
    model (V = unigram vocab size). The unigram proxy
    (unigram_logprob) scores WHAT words a page uses; this scores
    whether they follow each other like language — word-salad spam
    and keyword stuffing pass unigram filters (common words!) and
    fail here. Returns (id, n_bigrams, avg_neg_logprob); documents
    with fewer than two tokens have no transitions and are absent.

    Plan: one token explode persisted (feeds the unigram model AND
    the bigram builder), bigrams via a doc-partitioned lead() window
    (the repetition_features shape), one (v, w) model aggregate, and
    scoring joins that carry counts — not text. The bigram model is
    corpus-derived and size-unknown, so its join is left unhinted
    (AQE decides); V rides a one-row broadcast crossJoin."""
    from json_schema_spark.cache import register_cache

    toks = register_cache(
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col),
                F.posexplode(tokens(F.lower(F.col(text_col))))
                .alias("pos", "t")))
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy("pos")
    bg = register_cache(
        toks.withColumn("_w", F.lead("t").over(w))
        .filter(F.col("_w").isNotNull())
        .select(F.col(id_col), F.col("t").alias("v"),
                F.col("_w").alias("w")))
    ugm = register_cache(
        toks.groupBy(F.col("t").alias("v"))
        .agg(F.count(F.lit(1)).alias("c_v")))
    bgm = bg.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c_vw"))
    # "n_vocab", not "V": Spark resolves columns case-
    # insensitively by default, so "V" would collide with the
    # bigram token column "v"
    totals = ugm.agg(F.count(F.lit(1)).alias("n_vocab"))
    # crossJoin the one-row totals BEFORE joining the model tables —
    # joining ugm first and then crossJoining ugm.agg() trips
    # AMBIGUOUS_REFERENCE on the shared lineage (repo gotcha; same
    # ordering as unigram_logprob)
    scored = (bg.crossJoin(F.broadcast(totals))
              .join(bgm, ["v", "w"])
              .join(ugm, "v")
              .withColumn("_nlp", -F.log(
                  (F.col("c_vw") + 1).cast("double")
                  / (F.col("c_v") + F.col("n_vocab")).cast("double"))))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.avg("_nlp"), 6).alias("avg_neg_logprob")))


def dsir_weights(df: DataFrame, target_df: DataFrame,
                 text_col: str = "text", id_col: str = "doc_id",
                 target_text_col: str | None = None) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS 2023 — Data
    Selection via Importance Resampling): score every raw-corpus
    document by how much more likely a TARGET distribution (a small
    high-quality corpus: wiki, books, curated eval-adjacent text)
    makes its tokens than the raw corpus itself does. Per token t:
    ln p_tgt(t) - ln p_raw(t) under add-one-smoothed unigram models
    over the UNION vocabulary (the paper hashes n-grams into fixed
    buckets; the unigram-over-union-vocab form is its SQL-expressible
    core, same simplification unigram_logprob makes for CCNet).

    Returns (id, n_tokens, avg_log_ratio) where avg_log_ratio is the
    per-token MEAN of the log ratio, rounded to 6 dp — the
    length-normalized variant (multiply by n_tokens for the paper's
    summed weight; the mean keeps the cross-engine float story
    identical to unigram_logprob's audited avg). Positive = more
    target-like than the corpus average.

    Scale story: the raw model derives from the corpus token explode
    (cached once, two consumers); the target corpus is a bounded
    curated set, but its model is full-outer-merged with the raw
    model into ONE combined (t, n_raw, n_tgt) table so scoring is a
    single vocabulary join — unhinted, like unigram_logprob's derived
    vocab (billions of distinct tokens at web scale; AQE broadcasts
    only when it measures small). N/V totals ride a one-row broadcast
    cross-join so every token sees them."""
    from json_schema_spark.cache import register_cache

    tcol = target_text_col or text_col
    toks = register_cache(
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col),
                F.explode(tokens(F.lower(F.col(text_col)))).alias("t")))
    raw = toks.groupBy("t").agg(F.count(F.lit(1)).alias("n_raw"))
    tgt = (target_df.filter(F.col(tcol).isNotNull())
           .select(F.explode(tokens(F.lower(F.col(tcol)))).alias("t"))
           .groupBy("t").agg(F.count(F.lit(1)).alias("n_tgt")))
    model = register_cache(
        raw.join(tgt, "t", "full_outer")
        .select("t",
                F.coalesce(F.col("n_raw"), F.lit(0)).alias("n_raw"),
                F.coalesce(F.col("n_tgt"), F.lit(0)).alias("n_tgt")))
    totals = model.agg(F.sum("n_raw").alias("N_raw"),
                       F.sum("n_tgt").alias("N_tgt"),
                       F.count(F.lit(1)).alias("V"))
    # per-token log ratio splits into a count part ln(n_tgt+1) -
    # ln(n_raw+1) and a per-corpus CONSTANT ln(N_raw+V) - ln(N_tgt+V);
    # applying the constant after the per-doc aggregation keeps the
    # totals out of the token-level plan entirely (joining model AND
    # its own aggregate into the same token stream trips Spark's
    # self-join attribute dedup — AMBIGUOUS_REFERENCE) and saves two
    # ln calls per token. The oracle replays this exact association:
    # avg(diff) + (ln(N_raw+V) - ln(N_tgt+V)).
    scored = (toks.join(model, "t", "left")
              .withColumn("_d", F.log(
                  (F.coalesce(F.col("n_tgt"), F.lit(0)) + 1)
                  .cast("double"))
                  - F.log(
                  (F.coalesce(F.col("n_raw"), F.lit(0)) + 1)
                  .cast("double"))))
    per_doc = (scored.groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_tokens"),
                    F.avg("_d").alias("_avg_d")))
    return (per_doc.crossJoin(F.broadcast(totals))
            .select(F.col(id_col), F.col("n_tokens"),
                    F.round(F.col("_avg_d") + (
                        F.log((F.col("N_raw") + F.col("V"))
                              .cast("double"))
                        - F.log((F.col("N_tgt") + F.col("V"))
                                .cast("double"))), 6)
                    .alias("avg_log_ratio")))


def dsir_select(df: DataFrame, target_df: DataFrame, n: int,
                id_col: str = "doc_id", **kwargs: Any) -> DataFrame:
    """The DSIR selection cut: the ``n`` corpus documents whose tokens
    look most target-like (highest avg_log_ratio, doc id breaking
    exact ties — ranking runs on the ROUNDED score, so the boundary is
    engine-reproducible). Returns (id, n_tokens, avg_log_ratio, rank).

    Scale note: a global top-n over per-doc scores — Spark plans
    rank-over-empty-partitioning as a single-partition window, fine
    for the bounded n a training mix wants; for huge n switch to an
    approx threshold (approxQuantile on avg_log_ratio) + filter."""
    from pyspark.sql import Window as W

    w = dsir_weights(df, target_df, id_col=id_col, **kwargs)
    win = W.partitionBy().orderBy(F.col("avg_log_ratio").desc(),
                                  F.col(id_col))
    return (w.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= n))


def tfidf_topk(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the classic keyword /
    topic-proxy extraction a corpus explorer wants next to quality
    scores. tf = in-doc term count (lowercased whitespace tokens),
    idf = ln((n_docs + 1) / (df_t + 1)) (add-one smoothed, always
    positive), score = tf * idf rounded to 6 dp; rank by (rounded
    score desc, term asc) so the k-boundary is engine-reproducible
    (same tie-break discipline as ngram_topk).

    Plan: ONE token explode feeds a (doc, term) count; document
    frequency and the doc total both derive from that cached table
    (df_t = term's row count there, n_docs via a one-row broadcast
    cross-join), so the corpus is scanned once. The df_t join is
    vocabulary-sized and left UNHINTED. The per-doc top-k is a window
    over id — partitioned by the aggregation's own key, so AQE
    coalesces, no single-partition choke. Returns
    (id, term, tf, df_t, score, rank)."""
    from json_schema_spark.cache import register_cache
    from pyspark.sql import Window as W

    tf = register_cache(
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col),
                F.explode(tokens(F.lower(F.col(text_col)))).alias("t"))
        .groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf")))
    dft = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df_t"))
    nd = tf.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (tf.join(dft, "t")
              .crossJoin(F.broadcast(nd))
              .withColumn("score", F.round(
                  F.col("tf") * F.log(
                      (F.col("n_docs") + 1).cast("double")
                      / (F.col("df_t") + 1).cast("double")), 6)))
    win = W.partitionBy(id_col).orderBy(F.col("score").desc(),
                                        F.col("t"))
    return (scored.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .select(id_col, F.col("t").alias("term"), "tf", "df_t",
                    "score", "rank"))


def chunk_documents(df: DataFrame, chunk_size: int = 64,
                    overlap: int = 16,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split each document into overlapping fixed-size token windows —
    the RAG / long-context training prep step. Chunk i covers
    whitespace tokens [i*stride, i*stride + chunk_size) with
    stride = chunk_size - overlap; the number of chunks is
    1 if n <= chunk_size else ceil((n - chunk_size) / stride) + 1, so
    the final window always reaches the last token and only the final
    chunk may be short. Empty documents yield no chunks.

    Output: id_col, chunk_id (0-based), chunk_text, n_chunk_tokens.

    Scale story: a pure projection + one generate — the token split
    runs ONCE per document (materialized by a select *before* the
    posexplode, because Catalyst does no CSE inside the per-chunk
    slice expressions), then the explode duplicates the evaluated
    array, not the split. Zero shuffle, zero Python; parallelism is
    the scan's. Chunk counts are bounded by document length, so no
    skew beyond the corpus's own length skew (cap upstream via a
    length filter if pathological documents exist)."""
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    if not 0 <= overlap < chunk_size:
        raise ValueError("overlap must be in [0, chunk_size)")
    stride = chunk_size - overlap
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    n = F.size("_t")
    n_chunks = (F.when(n <= 0, F.lit(0))
                .when(n <= chunk_size, F.lit(1))
                .otherwise(F.ceil((n - chunk_size)
                                  / F.lit(float(stride))) + 1))
    # sequence(0, -1) would count DOWN — guard the empty-doc case
    idx = F.when(n_chunks > 0,
                 F.sequence(F.lit(0), (n_chunks - 1).cast("int"))) \
           .otherwise(F.array().cast("array<int>"))
    start = F.col("chunk_id") * stride
    return (toks
            .select(id_col, "_t", F.explode(idx).alias("chunk_id"))
            .select(id_col, "chunk_id",
                    F.concat_ws(" ", F.slice(F.col("_t"), start + 1,
                                             chunk_size))
                    .alias("chunk_text"),
                    F.least(F.lit(chunk_size), F.size("_t") - start)
                    .cast("int").alias("n_chunk_tokens")))


def ngram_topk(df: DataFrame, n: int = 3, k: int = 20,
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide most-frequent word n-grams — the boilerplate /
    memorization-risk screen (a gram seen in thousands of documents is
    template text; a rare long gram repeated many times in one doc is
    a repetition artifact). Output: gram, n_occ (total occurrences),
    n_docs (documents containing it), top ``k`` by n_occ with a
    deterministic gram-lexicographic tie-break so results are
    engine-replayable.

    Scale story: tokens are split ONCE per document (materialized
    before the per-gram slices — Catalyst does no CSE inside HOF
    lambdas), the gram explode feeds a two-level aggregation
    (gram,doc partial counts, then gram totals — both map-side
    combined), and the top-k is TakeOrderedAndProject: per-partition
    heads merged on the driver, never a global sort. Skew-safe: a
    degenerate hot gram is still just one row per (gram, doc) after
    the first aggregation."""
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = df.select(F.col(id_col),
                     tokens(F.lower(F.col(text_col))).alias("_t"))
    size = F.size("_t")
    idx = F.when(size >= n,
                 F.sequence(F.lit(1), size - (n - 1))) \
           .otherwise(F.array().cast("array<int>"))
    grams = toks.select(
        id_col,
        F.explode(F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(F.col("_t"), i, n))))
        .alias("gram"))
    per_doc = grams.groupBy("gram", id_col) \
                   .agg(F.count(F.lit(1)).alias("_c"))
    counts = per_doc.groupBy("gram").agg(
        F.sum("_c").alias("n_occ"),
        F.count(F.lit(1)).alias("n_docs"))
    return counts.orderBy(F.desc("n_occ"), F.asc("gram")).limit(k)


def dedup_lines_in_doc(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       out_col: str = "text_clean") -> DataFrame:
    """Intra-document repeated-line removal (the within-doc counterpart
    of remove_boilerplate_lines): every line whose TRIMMED form already
    appeared earlier in the SAME document is dropped (keep-first);
    whitespace-only lines are kept — they carry structure. Output:
    input columns + ``out_col`` (NULL text stays NULL).

    Scale story: a zero-shuffle pure projection — lines and their
    trimmed forms are materialized ONCE per document (two stacked
    selects; a plan test pins the single split), then keep/drop is an
    indexed array filter whose first-occurrence probe is
    array_position over the trimmed array. The probe makes the filter
    O(lines^2) string compares PER DOCUMENT (document-local CPU, no
    shuffle): right for web documents (10s-100s of lines). For
    pathological inputs (>~10k lines/doc), length-cap upstream or
    explode + first-occurrence window (two text-sized shuffles) —
    the crossover is where local L^2 beats re-shuffling the corpus
    twice."""
    t = F.col(text_col)
    staged = df.withColumn("_lines", F.split(t, "\n")) \
               .withColumn("_tr", F.transform("_lines",
                                              lambda x: F.trim(x)))
    kept = F.filter(
        F.col("_lines"),
        lambda x, i: (F.trim(x) == "")
        | (F.array_position(F.col("_tr"), F.trim(x)) == i + F.lit(1)))
    return (staged.withColumn(
        out_col, F.when(t.isNotNull(), F.array_join(kept, "\n")))
        .drop("_lines", "_tr"))


def perplexity_split(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", lang_col: str = "lang",
                     vocab: DataFrame | None = None,
                     min_count: int = 1,
                     n_buckets: int = 3,
                     bucket_names: tuple[str, ...] = ("head", "middle",
                                                      "tail")) -> DataFrame:
    """CCNet's head/middle/tail corpus split (Wenzek et al. 2020,
    §4.3): rank documents PER LANGUAGE by unigram average negative
    log-probability (lower = more fluent) and cut at equal
    percent-rank boundaries — bucket = min(floor(pr * n), n-1), so
    'head' is the most-fluent third under the default 3 buckets.
    Ties break by id, making the cut engine-reproducible. Output:
    id, lang, n_tokens, avg_neg_logprob, ppl_bucket.

    Scale story: rides unigram_logprob (token explode cached once,
    two aggregations) plus ONE per-language window sort and an
    id-equi-join back to the language column. A single dominant
    language degrades the window toward one reducer — the same
    caveat as take_per_stratum; pre-partition by language shards if
    one language is the whole corpus."""
    if not 1 <= n_buckets <= len(bucket_names):
        raise ValueError("need a name per bucket")
    from pyspark.sql import Window as W

    scored = unigram_logprob(df, text_col, id_col, vocab=vocab,
                             min_count=min_count)
    langs = df.select(F.col(id_col), F.col(lang_col))
    pr = F.percent_rank().over(
        W.partitionBy(lang_col).orderBy("avg_neg_logprob", id_col))
    names = F.array(*[F.lit(b) for b in bucket_names[:n_buckets]])
    idx = F.least(F.floor(pr * n_buckets),
                  F.lit(n_buckets - 1)).cast("int")
    return (scored.join(langs, id_col)
            .withColumn("ppl_bucket", F.element_at(names, idx + 1))
            .select(id_col, lang_col, "n_tokens", "avg_neg_logprob",
                    "ppl_bucket"))
