"""Production entrypoint: checkpoint-resumable webtext validation via
spark-submit.

Cluster launch (north_rule: spark-submit --py-files, N and 4N executors):

    cd /root/repo && zip -qr /tmp/jss.zip json_schema_spark
    spark-submit --py-files /tmp/jss.zip \\
        --num-executors 64 --executor-cores 4 --executor-memory 16g \\
        scripts/run_validation_job.py \\
        --input warehouse.webtext --output s3://bucket/validation_out

The session comes from spark-submit (master/executors are cluster-owned);
this script only builds the job. Local smoke:

    python scripts/run_validation_job.py \\
        --input /tmp/jss_scaling_webtext --output /tmp/jss_job_out \\
        --local 8

Re-running the same command resumes: partitions with a COMPLETE manifest
and an unchanged constraint-set hash are skipped (see
json_schema_spark/ops/checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="Iceberg table identifier or parquet path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--partition-col", default="warc_day")
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--local", type=int, default=None,
                    help="run on local[N] instead of the submitted master")
    ap.add_argument("--partitions", nargs="*", default=None,
                    help="restrict to specific partition values")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    if args.local:
        from json_schema_spark.session import get_spark
        spark = SparkSession.getActiveSession() or get_spark(
            app_name="validation_job", cores=args.local)
    else:
        spark = SparkSession.builder.appName(
            "jss_validation_job").getOrCreate()

    from json_schema_spark.flagship import webtext_constraints
    from json_schema_spark.ops.checkpoint import (
        resume_summary, run_validation)
    from json_schema_spark.sources.io import (
        iceberg_snapshot_id, read_table)

    df = read_table(spark, args.input)
    if args.partition_col not in df.columns:
        if "warc_ts" in df.columns:
            df = df.withColumn(args.partition_col, F.to_date("warc_ts"))
        else:
            raise SystemExit(
                f"partition column {args.partition_col!r} not in input")

    snapshot = iceberg_snapshot_id(spark, args.input) \
        if "/" not in args.input else None
    stats = run_validation(
        spark, df, webtext_constraints(), args.output,
        partition_col=args.partition_col, id_col=args.id_col,
        snapshot_id=snapshot, partitions=args.partitions)

    print(json.dumps({
        "processed": len(stats.processed),
        "skipped_complete": len(stats.skipped),
        "summary": resume_summary(args.output),
    }))


if __name__ == "__main__":
    main()
