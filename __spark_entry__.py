"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship validation over sf0.001 documents (smoke).
queries()      — one callable per implemented operator (SURVEY.md §2).
oracle_sql()   — DuckDB-equivalent SQL per query for the correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DOC_LANGS = ["en", "zh", "es", "de"]  # 'fr' intentionally outside → violations


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _documents_cset():
    from json_schema_spark import ConstraintSet

    return ConstraintSet(
        name="documents_checks",
        columns={
            "doc_id": {"required": True},
            "text": {"type": ["string", "null"], "minLength": 1,
                     "pattern": r"\S"},
            "lang": {"enum": DOC_LANGS},
            "n_chars": {"minimum": 0, "maximum": 300},
        },
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full constraint validation over sf0.001 documents →
    violation rows (doc_id, constraint_id, observed_value)."""
    from json_schema_spark import validate

    df = _docs(spark, "/root/testdata/sf0.001")
    res = validate(df, _documents_cset(), id_col="doc_id", observe=False)
    return res.violations()


# ---------------------------------------------------------------------------
# queries / oracles
# ---------------------------------------------------------------------------

def _q_validate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from json_schema_spark import validate

    res = validate(_docs(spark, sf_dir), _documents_cset(),
                   id_col="doc_id", observe=False)
    return res.violations()


_SQL_VALIDATE_DOCUMENTS = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'doc_id.required' AS constraint_id,
       CAST(doc_id AS VARCHAR) AS observed_value
FROM documents WHERE doc_id IS NULL
UNION ALL
SELECT CAST(doc_id AS VARCHAR), 'text.minLength', text
FROM documents WHERE text IS NOT NULL AND length(text) < 1
UNION ALL
SELECT CAST(doc_id AS VARCHAR), 'text.pattern', text
FROM documents WHERE text IS NOT NULL AND NOT regexp_matches(text, '\\S')
UNION ALL
SELECT CAST(doc_id AS VARCHAR), 'lang.enum', lang
FROM documents WHERE lang IS NOT NULL AND lang NOT IN ('en','zh','es','de')
UNION ALL
SELECT CAST(doc_id AS VARCHAR), 'n_chars.minimum', CAST(n_chars AS VARCHAR)
FROM documents WHERE n_chars IS NOT NULL AND n_chars < 0
UNION ALL
SELECT CAST(doc_id AS VARCHAR), 'n_chars.maximum', CAST(n_chars AS VARCHAR)
FROM documents WHERE n_chars IS NOT NULL AND n_chars > 300
"""


def _q_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group column stats (exact flavor of checks/stats.py so DuckDB can
    mirror it)."""
    return (_docs(spark, sf_dir)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars"),
                 F.avg("n_chars").alias("avg_chars"),
                 F.count_distinct("source").alias("n_sources")))


_SQL_STATS_BY_LANG = """
SELECT lang, count(*) AS n_docs, min(n_chars) AS min_chars,
       max(n_chars) AS max_chars, avg(n_chars) AS avg_chars,
       count(DISTINCT source) AS n_sources
FROM documents GROUP BY lang
"""


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate detection (dataset-level uniqueItems) on events.user_id."""
    from json_schema_spark.checks.uniqueness import duplicate_keys

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return duplicate_keys(ev, ["user_id"])


_SQL_DEDUP_EXACT = """
SELECT user_id, count(*) AS dup_count
FROM events GROUP BY user_id HAVING count(*) > 1
"""


def _q_referential_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from json_schema_spark.checks.referential import referential_violations

    return referential_violations(_docs(spark, sf_dir), "lang",
                                  DOC_LANGS, id_col="doc_id")


_SQL_REFERENTIAL_LANG = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       'lang.referential' AS constraint_id, lang AS observed_value
FROM documents WHERE lang IS NOT NULL AND lang NOT IN ('en','zh','es','de')
"""


def _q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from json_schema_spark.checks.stats import length_histogram

    return length_histogram(_docs(spark, sf_dir), "text", bucket_width=50)


_SQL_LENGTH_HISTOGRAM = """
SELECT CAST(floor(length(text) / 50) * 50 AS BIGINT) AS bucket_start,
       count(*) AS n
FROM documents WHERE text IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def _q_agg_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped aggregation (scan → filter → partial+final agg)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
                 F.count(F.lit(1)).alias("count_order")))


_SQL_AGG_PUSHDOWN = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def _q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per event_type (window operator)."""
    from pyspark.sql import Window as W

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id"))
    return (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("event_type", "event_id", "rn"))


_SQL_TOPK_PER_GROUP = """
SELECT event_type, event_id, rn FROM (
  SELECT event_type, event_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rn
  FROM events
) WHERE rn <= 3
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "validate_documents": _q_validate_documents,
        "stats_by_lang": _q_stats_by_lang,
        "dedup_exact": _q_dedup_exact,
        "referential_lang": _q_referential_lang,
        "length_histogram": _q_length_histogram,
        "agg_pushdown": _q_agg_pushdown,
        "topk_per_group": _q_topk_per_group,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "validate_documents": _SQL_VALIDATE_DOCUMENTS,
        "stats_by_lang": _SQL_STATS_BY_LANG,
        "dedup_exact": _SQL_DEDUP_EXACT,
        "referential_lang": _SQL_REFERENTIAL_LANG,
        "length_histogram": _SQL_LENGTH_HISTOGRAM,
        "agg_pushdown": _SQL_AGG_PUSHDOWN,
        "topk_per_group": _SQL_TOPK_PER_GROUP,
    }
