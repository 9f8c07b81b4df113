"""WARC-lite ingestion — split concatenated WARC text into records.

WARC (ISO 28500) is the interchange format every public crawl ships
(Common Crawl, IA): records open with a ``WARC/1.0`` version line,
carry ``Name: value`` headers, then a blank line, then the payload.
A Spark ingest of *textual* WARC (warc/wet exports) is a pure
string-splitting problem — no per-record Python:

- split each document on the version line (multiline anchor),
- explode records,
- header block = everything up to the first blank line; payload = the
  rest (trailing record separators trimmed),
- pull the four headers every pipeline keys on (WARC-Type,
  WARC-Target-URI, WARC-Date, Content-Type) case-insensitively.

LITE by design (documented): payloads are treated as text, not
Content-Length byte slices — binary payloads or payloads that
themselves contain a line reading ``WARC/1.0`` need the byte-accurate
reader (a mapInPandas over binary files, same pattern as
textops/multimodal.py); wet/wat text extracts — the form LLM corpus
work actually ingests — split exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_warc"]

_SPLIT_RX = r"(?m)^WARC/1\.[01]\r?\n"
_HDR_RX = r"(?s)^(.*?)\r?\n\r?\n"


def parse_warc(df: DataFrame, warc_col: str = "warc") -> DataFrame:
    """One row per WARC record: (warc_type, target_uri, warc_date,
    content_type, payload). Headers are extracted from the HEADER
    BLOCK only (a payload that mentions 'WARC-Type:' cannot spoof);
    records with no blank-line separator are all-header with an empty
    payload; header values trim; absent headers -> NULL. NULL input
    documents drop.

    Plan: one split + one explode + a constant projection of
    regexp_extracts over a header block materialized ONCE (multi-
    referenced attribute survives CollapseProject — the repo's
    explode-projection rule) — zero shuffle, zero Python; the explode
    fan-out is bounded by records-per-file (WARC writers cap segment
    size at ~1 GB, thousands of records)."""
    recs = (df.filter(F.col(warc_col).isNotNull())
            .select(F.explode(F.split(F.col(warc_col), _SPLIT_RX))
                    .alias("_rec"))
            .filter(F.trim(F.col("_rec")) != ""))
    has_sep = F.col("_rec").rlike(_HDR_RX)
    staged = recs.select(
        "_rec",
        F.when(has_sep, F.regexp_extract(F.col("_rec"), _HDR_RX, 1))
        .otherwise(F.col("_rec")).alias("_hdr"),
        F.when(has_sep, F.regexp_replace(F.col("_rec"), _HDR_RX, ""))
        .otherwise("").alias("_body"))

    def _header(name: str):
        c = F.regexp_extract(F.col("_hdr"),
                             rf"(?im)^{name}\s*:\s*([^\r\n]*)", 1)
        return F.when(F.trim(c) != "", F.trim(c))

    return staged.select(
        _header("WARC-Type").alias("warc_type"),
        _header("WARC-Target-URI").alias("target_uri"),
        _header("WARC-Date").alias("warc_date"),
        _header("Content-Type").alias("content_type"),
        F.regexp_replace(F.col("_body"), r"(?s)\r?\n\r?\n$", "")
        .alias("payload"))
