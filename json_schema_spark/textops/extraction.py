"""HTML -> text extraction, expression-only.

The webtext data model carries both `html` (binary, as crawled) and
`text` (the extracted text). The north_star's per-row invariant is that
extraction is deterministic: re-extracting from `html` must reproduce
`text` byte-for-byte. This module is that extractor — pure Catalyst
expressions (decode / regexp_replace chains), so the invariant can be
asserted at any scale with one scan and zero Python:

    df.filter(html_to_text(F.col("html")) != F.col("text"))  # must be 0
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decode_html(col: Column, charset: str = "UTF-8") -> Column:
    """binary -> string (crawled pages are stored as raw bytes)."""
    return F.decode(col, charset)


def strip_tags(col: Column) -> Column:
    """Drop <script>/<style> blocks (content is code, not text), <head>
    (title/meta are not body text), then every remaining tag."""
    no_script = F.regexp_replace(
        col, r"(?is)<script[^>]*>.*?</script>", " ")
    no_style = F.regexp_replace(
        no_script, r"(?is)<style[^>]*>.*?</style>", " ")
    no_head = F.regexp_replace(no_style, r"(?is)<head>.*?</head>", "")
    return F.regexp_replace(no_head, r"<[^>]*>", "")


def decode_entities(col: Column) -> Column:
    """The common named/numeric entities (full decoding needs a table;
    these cover the overwhelming majority of web text)."""
    out = col
    for entity, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                       ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
                       ("&nbsp;", " ")):
        out = F.replace(out, F.lit(entity), F.lit(ch))
    return out


def html_to_text(col: Column, charset: str = "UTF-8") -> Column:
    """Full pipeline: decode -> strip -> entities. NULL html -> NULL."""
    return decode_entities(strip_tags(decode_html(col, charset)))


def extracted_text_violations(df, html_col: str = "html",
                              text_col: str = "text",
                              id_col: str = "url"):
    """Rows where re-extraction does NOT reproduce the stored text
    byte-for-byte — the invariant check as a violations DataFrame."""
    re_extracted = html_to_text(F.col(html_col))
    # a page with no extracted text stores NULL; re-extraction of its
    # html yields '' — the invariant equates the two
    stored = F.coalesce(F.col(text_col), F.lit(""))
    return (df
            .filter(F.col(html_col).isNotNull())
            .filter(~re_extracted.eqNullSafe(stored))
            .select(F.col(id_col).cast("string").alias(id_col),
                    F.lit("text.extraction_invariant")
                    .alias("constraint_id"),
                    re_extracted.alias("observed_value")))
