"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure Catalyst expressions (split/regexp/md5/higher-order functions) —
single-pass, no shuffle, no Python — so each operator is a per-row
projection that runs at scan speed on any corpus size.
"""

from __future__ import annotations

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


def analyze(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Full text-analysis pass: token-at-a-time.

    The projection-only form (language_id + quality_score as one select)
    embeds every stopword-hit count dozens of times across the argmax
    when-chain, and Catalyst re-evaluates the tokenize+filter expression
    per occurrence (no CSE inside lambda bodies) — ~200 docs/s/core.
    Here tokens explode once, the per-language hit counts become ONE
    aggregation each (attributes thereafter), and the when-chain/ratios
    are cheap arithmetic over those attributes. The groupBy shuffles one
    row per doc per task (partial agg); doc ids are unique, so no skew.
    """
    col = F.col(text_col)
    lit_words = {lang: F.array(*[F.lit(w) for w in words])
                 for lang, words in STOPWORDS.items()}
    toks = (df.filter(col.isNotNull())
            .select(F.col(id_col), col.alias("_text"),
                    F.explode_outer(tokens(F.lower(col))).alias("t")))
    hit_aggs = [
        F.sum(F.when(F.array_contains(lit_words[lang], F.col("t")), 1)
              .otherwise(0)).alias(f"_hits_{lang}")
        for lang in STOPWORDS]
    agg = (toks.groupBy(id_col)
           .agg(F.first("_text").alias("_text"),
                F.count("t").alias("n_tokens"),
                *hit_aggs))

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

    text = F.col("_text")
    n_chars = F.length(text)
    n_tokens = F.col("n_tokens")
    n_punct = F.coalesce(F.regexp_count(text, F.lit(r"[.,;:!?]")),
                         F.lit(0))
    n_alpha = F.coalesce(F.regexp_count(text, F.lit(r"[A-Za-z]")),
                         F.lit(0))
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
        subword_count(text).alias("n_subwords"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        quality.alias("quality"),
        fingerprint(text).alias("fingerprint"))
