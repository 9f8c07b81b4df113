"""Benchmark harness (driver contract).

Runs every `queries()` entry from `__spark_entry__` at
`$SPARK_GRAFT_SF_DIR` (default /root/testdata/sf0.1) on
`local[$SPARK_GRAFT_CPUS]` (default 32) and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1, ...}

Each query is forced through a `noop` sink so the full plan executes
(count() alone would let Catalyst prune most of the work). A flagship
webtext-validation throughput number (docs/sec over a generated
Common-Crawl-style table) is included under "docs_per_sec" — that is the
metric BASELINE.json names. Scaling-efficiency runs (local[8] vs local[32])
live in scripts/bench_scaling.py and are reported in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# webtext rows for the flagship throughput number: 1M at sf0.1
WEBTEXT_ROWS = int(os.environ.get("BENCH_WEBTEXT_ROWS", "1000000"))
# best-of-N per query: the host is multi-tenant and single-shot wall
# times vary ~30%; the best of two runs tracks the engine, not the
# neighbor load (and run 2 is plan-cache warm, like steady state)
REPS = int(os.environ.get("BENCH_REPS", "2"))


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import __spark_entry__ as entry
    from json_schema_spark.session import get_spark

    spark = get_spark(app_name="bench", cores=CPUS)

    # JVM warm-up so q1 doesn't pay session-start cost
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # deeper JIT/codegen warm-up: round-2 driver timings showed the
    # first ~6 queries 2x their steady-state wall (one-time whole-stage
    # codegen + JIT compilation of the scan/agg paths); replay the
    # early queries untimed at the smallest SF so the timed region
    # starts warm
    warm_sf = os.environ.get("BENCH_WARMUP_SF_DIR",
                             "/root/testdata/sf0.001")
    qs = entry.queries()
    # 12, not 8: the round-5 driver-window rotation moved queries with
    # heavy one-time codegen (baseline_drift's t-digest pipeline) into
    # registry slots 9-10; measured best-of-2 at slot 9 was 7.2s cold
    # vs 1.4s steady-state — the warmup exists precisely to keep that
    # artifact out of the timed region
    for name in list(qs)[:12]:
        try:
            _run(qs[name](spark, warm_sf))
        except Exception as exc:  # warm-up must never fail the bench
            print(f"[bench] warmup {name}: {exc}", file=sys.stderr)
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name, fn in entry.queries().items():
        print(f"[bench] {name} ...", file=sys.stderr, flush=True)
        best = float("inf")
        for _ in range(max(1, REPS)):
            spark.catalog.clearCache()  # operator-internal persists
            t0 = time.perf_counter()
            _run(fn(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"[bench] {name} {timings[name]}s", file=sys.stderr,
              flush=True)

    # flagship: constraint-validation throughput over generated webtext
    from json_schema_spark.flagship import validate_webtext
    from json_schema_spark.sources.webtext import generate_webtext

    web = generate_webtext(spark, WEBTEXT_ROWS).cache()
    web.count()  # materialize input outside the timed region
    webtext_sec = float("inf")
    for _ in range(max(1, REPS)):
        t0 = time.perf_counter()
        _run(validate_webtext(web).violations())
        webtext_sec = min(webtext_sec, time.perf_counter() - t0)
    timings["validate_webtext"] = round(webtext_sec, 4)
    web.unpersist()

    # adversarial-skew stress row (VERDICT r4 #5): Zipf(1.2) hosts, a
    # 10^5-duplicate digest, one hot LSH band, one degenerate embedding
    # cell — through the three skew-guarded operators. Graceful wall
    # time here is the evidence the caps work COMBINED, not just in
    # unit tests.
    from pyspark.sql import functions as F

    from json_schema_spark.sources.webtext import generate_skewed_corpus
    from json_schema_spark.textops import dedup as _dd
    from json_schema_spark.textops.sampling import cap_per_group
    from json_schema_spark.textops.similarity import semantic_dedup

    skew = generate_skewed_corpus(spark, 200_000, n_dup=100_000,
                                  n_hot_band=10_000).cache()
    skew.count()
    skew_sec = float("inf")
    for _ in range(1):  # stress row, not a regression row: one rep
        t0 = time.perf_counter()
        _run(_dd.near_duplicates(skew, threshold=0.8,
                                 max_bucket_size=50))
        _dd.release_caches()
        _run(cap_per_group(skew, "host", 5, [F.col("doc_id")],
                           salt_shards=16, id_col="doc_id"))
        _run(semantic_dedup(skew, id_col="doc_id", vec_col="embedding",
                            max_cluster_size=500))
        _dd.release_caches()
        skew_sec = min(skew_sec, time.perf_counter() - t0)
    timings["skew_stress"] = round(skew_sec, 4)
    skew.unpersist()

    out = {
        "metric": "query wall-time, sf%s + webtext validation" % _sf_from_dir(SF_DIR),
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
        "webtext_rows": WEBTEXT_ROWS,
        "docs_per_sec": round(WEBTEXT_ROWS / webtext_sec, 1),
        "cores": CPUS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
