"""Source readers: Iceberg-first with parquet fallback.

Production target is an Iceberg catalog table (BASELINE.json: "Iceberg
table of Common-Crawl-style web pages"); the test image has no Iceberg jars,
so the reader degrades to parquet paths transparently. Everything
downstream is source-agnostic — constraints compile against the DataFrame
schema either way, and partition pruning / predicate pushdown work through
both (Iceberg via its Spark source, parquet via the native reader).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, table_or_path: str,
               snapshot_id: int | None = None) -> DataFrame:
    """Read an Iceberg table by identifier, or a parquet directory by path.

    ``snapshot_id`` pins an Iceberg snapshot (time travel) — required for
    checkpoint-resume lineage so a resumed run re-reads the exact snapshot
    recorded in the manifest.
    """
    if "/" not in table_or_path:
        try:
            reader = spark.read.format("iceberg")
            if snapshot_id is not None:
                reader = reader.option("snapshot-id", str(snapshot_id))
            return reader.load(table_or_path)
        except Exception:
            pass  # no Iceberg runtime on the classpath → fall through
    return spark.read.parquet(table_or_path)


def iceberg_snapshot_id(spark: SparkSession, table: str) -> int | None:
    """Current snapshot id of an Iceberg table (None without Iceberg)."""
    try:
        row = spark.sql(
            f"SELECT snapshot_id FROM {table}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1").head()
        return int(row["snapshot_id"]) if row else None
    except Exception:
        return None
