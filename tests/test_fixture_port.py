"""Fixture-corpus parity: the engine must reproduce the reference's
verdict for every non-ignore-listed case in its golden test corpus
(/root/reference/tests/draft{4,6,7}) — schema-validity cases, data cases,
mode (CAST / REMOVE_ADDITIONALS / APPLY_DEFAULTS) rewrites with `expect`
comparison, per tests/run.php semantics.

Driver-side tests cover the full corpus per draft; the Spark test replays
the draft7 official corpus THROUGH the engine's executor path (Arrow
pandas-UDF with per-row schemas) and asserts identical verdicts.
"""

from __future__ import annotations

import os

import pytest

from tests.fixture_harness import REFERENCE_TESTS, collect_files, run_file

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_TESTS),
    reason="reference fixture corpus not present")


def _files_for(draft: str) -> list[tuple[str, str]]:
    return [(p, v) for p, v in collect_files() if f"/{draft}/" in p]


@pytest.mark.parametrize("draft", ["draft7", "draft6", "draft4"])
def test_corpus_green(draft):
    results = []
    for path, version in _files_for(draft):
        results.extend(run_file(path, version))
    fails = [r for r in results if not r.ok]
    assert results, f"no fixture cases found for {draft}"
    msg = "\n".join(
        f"{r.file} | {r.group} | {r.test} | expected {r.expected} "
        f"got {r.got} | {r.error}" for r in fails[:10])
    assert not fails, f"{len(fails)} fixture mismatches:\n{msg}"


def test_compiled_schema_pickles():
    """The compiled schema must survive pickling (ships to executors
    inside the pandas-UDF closure) — analog of run.php:145's
    serialize/unserialize round-trip. Meta-schemas are cyclic, so this
    also proves cycle-safe pickling."""
    results = []
    for path, version in _files_for("draft7"):
        results.extend(run_file(path, version, pickle_roundtrip=True))
    fails = [r for r in results if not r.ok]
    assert not fails, f"{len(fails)} mismatches after pickle round-trip"


def test_corpus_on_spark_executors(spark):
    """Replay the draft7 official corpus through the Arrow-batched
    executor path: one DataFrame of (schema, data, modes, expected) rows,
    one pandas-UDF pass, verdicts must match the fixtures exactly."""
    import json

    from pyspark.sql import functions as F

    from json_schema_spark.validator.json_column import pair_validation_udf
    from tests.fixture_harness import is_ignored, meta_schema_cache

    rows = []
    for path, version in _files_for("draft7"):
        if version != "7" or "/official/" not in path:
            continue
        with open(path) as fh:
            groups = json.load(fh)
        for g in groups:
            for t in g.get("tests", []) or []:
                if is_ignored(path, g.get("description", ""),
                              t.get("description", "")):
                    continue
                rows.append((
                    json.dumps(g["schema"]),
                    json.dumps(t.get("data")),
                    ",".join(t.get("modes", []) or []),
                    t["valid"],
                    f'{os.path.basename(path)} / {g.get("description")} / '
                    f'{t.get("description")}',
                ))
    assert len(rows) > 500

    df = spark.createDataFrame(
        rows, "schema string, data string, modes string, expected boolean, "
              "label string")
    # the meta-schema cache rides the UDF closure — remote $refs resolve
    # on executors with zero network I/O
    udf = pair_validation_udf("7", url_cache=meta_schema_cache())
    out = (df.withColumn("r", udf("schema", "data", "modes"))
             .select("label", "expected", F.col("r.valid").alias("got"))
             .filter(F.col("expected") != F.col("got")))
    mismatches = [r["label"] for r in out.collect()]
    assert not mismatches, f"{len(mismatches)}: {mismatches[:5]}"
