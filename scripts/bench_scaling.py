"""Scaling-efficiency evidence for the north_rule: the same validation
job at two parallelism levels (local[8] vs local[32] — the in-sandbox
stand-in for N vs 4N executors) over the SAME materialized input.

Protocol:
1. materialize a webtext table once (parquet, day-partitioned),
2. for each parallelism level, launch a FRESH JVM (subprocess) so
   nothing is shared but the input files; inside, run the flagship
   single-pass validation (violations -> noop sink) `reps` times and
   keep the best wall time (JIT/page-cache warmed),
3. efficiency = (docs_sec_high / docs_sec_low) / (cores_high/cores_low).

Prints one JSON line; `--write-md` refreshes BENCH/BASELINE.md.

Usage:
  python scripts/bench_scaling.py [--rows 2000000] [--write-md]
  python scripts/bench_scaling.py --worker <cores> <data_dir> <reps>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_ROWS = int(os.environ.get("BENCH_SCALING_ROWS", "2000000"))
DATA_DIR = os.environ.get("BENCH_SCALING_DIR",
                          "/tmp/jss_scaling_webtext")
LOW, HIGH = 8, 32
REPS = 3


def worker(cores: int, data_dir: str, reps: int) -> None:
    from json_schema_spark.flagship import validate_webtext
    from json_schema_spark.session import get_spark
    from json_schema_spark.sources.webtext import load_webtext

    spark = get_spark(app_name=f"scaling_{cores}", cores=cores)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up
    df = load_webtext(spark, data_dir)
    n = df.count()
    secs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        (validate_webtext(df).violations()
         .write.format("noop").mode("overwrite").save())
        secs.append(time.perf_counter() - t0)
    best = min(secs)
    print(json.dumps({"cores": cores, "rows": n,
                      "secs": [round(s, 3) for s in secs],
                      "best_sec": round(best, 3),
                      "docs_per_sec": round(n / best, 1)}))


def materialize(rows: int) -> None:
    if os.path.exists(os.path.join(DATA_DIR, "_SUCCESS")):
        return
    from json_schema_spark.session import get_spark
    from json_schema_spark.sources.webtext import write_webtext

    spark = get_spark(app_name="scaling_datagen", cores=32)
    write_webtext(spark, DATA_DIR, rows)
    spark.stop()


def run_level(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker",
         str(cores), DATA_DIR, str(REPS)],
        capture_output=True, text=True, check=True)
    last = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(last)


def main() -> None:
    rows = DEFAULT_ROWS
    write_md = "--write-md" in sys.argv
    if "--rows" in sys.argv:
        rows = int(sys.argv[sys.argv.index("--rows") + 1])

    materialize(rows)
    # interleave levels over two rounds and keep the per-level best —
    # the host is multi-tenant, so single samples are contention-noisy
    low, high = run_level(LOW), run_level(HIGH)
    low2, high2 = run_level(LOW), run_level(HIGH)
    if low2["best_sec"] < low["best_sec"]:
        low = low2
    if high2["best_sec"] < high["best_sec"]:
        high = high2
    eff = (high["docs_per_sec"] / low["docs_per_sec"]) / (HIGH / LOW)
    result = {
        "job": "webtext single-pass constraint validation -> violations",
        "rows": low["rows"],
        "low": low,
        "high": high,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    if write_md:
        os.makedirs("/root/repo/BENCH", exist_ok=True)
        with open("/root/repo/BENCH/BASELINE.md", "w") as fh:
            fh.write(f"""# BENCH / BASELINE — measured numbers

The reference publishes no throughput numbers (no bench harness in
`/root/reference/` — see BASELINE.md at the repo root). These are the
engine's measured numbers for the north_rule protocol: the SAME job —
single-pass webtext constraint validation (flagship.validate_webtext:
type/format/pattern/enum/length checks + fused referential + salted
uniqueness) — over the SAME {low["rows"]:,}-row day-partitioned parquet
input, at two parallelism levels in separate JVMs.

| parallelism | best wall (s) | docs/sec |
|---|---|---|
| local[{LOW}] (N) | {low["best_sec"]} | {low["docs_per_sec"]:,} |
| local[{HIGH}] (4N) | {high["best_sec"]} | {high["docs_per_sec"]:,} |

**Scaling efficiency (N -> 4N): {result["scaling_efficiency"]}**
(target >= 0.8 - {"PASS" if result["pass"] else "FAIL"}).

Reproduce: `python scripts/bench_scaling.py --write-md`
(rows via `BENCH_SCALING_ROWS`). Per-query wall times are in `bench.py`
output (driver-recorded as `BENCH_r{{N}}.json`).
""")


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(int(sys.argv[i + 1]), sys.argv[i + 2],
               int(sys.argv[i + 3]))
    else:
        main()
