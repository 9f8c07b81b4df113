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


def read_jsonl(spark: SparkSession, path: str,
               schema: str | None = None,
               corrupt_col: str = "_corrupt_record") -> DataFrame:
    """Line-delimited JSON corpus reader — the LLM-data interchange
    format. PERMISSIVE parse with an explicit corrupt-record column,
    so malformed lines are COUNTABLE downstream instead of silently
    dropped (filter ``corrupt_col IS NOT NULL`` to quarantine them —
    Spark refuses queries that reference ONLY the corrupt column on a
    raw JSON source, so keep a data column in the projection or cache
    first).

    Pass a DDL ``schema`` at scale: without one Spark runs a full
    inference pass over the data before the real read (2x the scan).
    The corrupt column is appended to the supplied schema
    automatically."""
    reader = (spark.read
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", corrupt_col))
    if schema is not None:
        reader = reader.schema(f"{schema}, {corrupt_col} string")
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str,
                compression: str = "gzip",
                n_shards: int | None = None) -> None:
    """Export a curated corpus as compressed JSONL shards (the
    training-data hand-off format). ``n_shards`` repartitions first —
    one round-robin exchange — to control shard count/size for the
    consumer (readers parallelize per shard; aim for 100 MB-1 GB
    compressed each). Leave it None to keep the upstream partitioning
    and skip the exchange."""
    out = df.repartition(n_shards) if n_shards else df
    out.write.mode("overwrite") \
       .option("compression", compression).json(path)


def write_curated(df: DataFrame, path: str,
                  partition_by: list[str] | None = None,
                  sort_by: list[str] | None = None,
                  max_records_per_file: int | None = None,
                  compression: str = "zstd") -> None:
    """Parquet export with the layout controls a 100-TB consumer
    needs: directory partitioning (partition pruning for readers),
    within-file sort (row-group locality — sorting by host/url makes
    per-domain scans touch few row groups and improves compression on
    web text), and ``maxRecordsPerFile`` so output files stay
    reader-sized regardless of task partitioning. zstd by default —
    the practical web-text ratio/speed point.

    Note: sort_by does a sortWithinPartitions (task-local, NO global
    shuffle); combine with repartition(partition_cols) upstream if
    you also want one file per partition value."""
    out = df
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode("overwrite").option("compression",
                                                compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile",
                               str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
