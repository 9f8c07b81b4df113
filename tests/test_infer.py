"""Schema inference: profile semantics, type normalization, and the
infer -> compile -> validate round trip (the inferred schema must
accept every document it was inferred from)."""

import pytest
from pyspark.sql import functions as F

from json_schema_spark.validator.infer import (
    FORMAT_BATTERY,
    infer_json_schema,
    json_field_profile,
    string_format_profile,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(60):
        parts = [f'"id": {i}', f'"name": "doc-{i}"']
        if i % 2 == 0:
            parts.append(f'"score": {i % 7}.5')
        if i % 3 == 0:
            parts.append('"tags": ["a", "b"]')
        if i % 5 == 0:
            parts.append('"meta": {"k": 1}')
        if i % 7 == 0:
            parts.append('"flag": true')
        if i % 11 == 0:
            parts.append('"extra": null')
        if i == 13:
            parts.append('"mixed": 3')
        if i == 14:
            parts.append('"mixed": "three"')
        rows.append((i, "{" + ", ".join(parts) + "}"))
    rows.append((998, None))
    return spark.createDataFrame(rows, "doc_id int, doc string")


def test_json_field_profile_types_and_counts(corpus):
    got = {(r.prop, r.jtype): r.n
           for r in json_field_profile(corpus).collect()}
    assert got[("id", "integer")] == 60
    assert got[("name", "string")] == 60
    assert got[("score", "number")] == 30
    assert got[("tags", "array")] == 20
    assert got[("meta", "object")] == 12
    assert got[("flag", "boolean")] == 9
    assert got[("extra", "null")] == 6
    assert got[("mixed", "integer")] == 1
    assert got[("mixed", "string")] == 1
    # no spurious rows
    assert sum(v for (_, _), v in
               ((k, v) for k, v in got.items())) == 60 * 2 + 30 + 20 \
        + 12 + 9 + 6 + 2


def test_json_field_profile_is_jvm_only(corpus):
    out = json_field_profile(corpus)
    phys = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in phys
    # one projection + one aggregate pair: a single hash exchange
    assert phys.count("Exchange hashpartitioning") <= 1


def test_infer_json_schema_shape(corpus):
    schema = infer_json_schema(corpus)
    assert schema["type"] == "object"
    props = schema["properties"]
    assert props["id"] == {"type": "integer"}
    assert props["score"] == {"type": "number"}
    assert props["mixed"] == {"type": ["integer", "string"]}
    assert props["extra"] == {"type": "null"}
    assert schema["required"] == ["id", "name"]


@pytest.fixture(scope="module")
def fmt_corpus(spark):
    rows = []
    for i in range(40):
        parts = [
            f'"id": {i}',
            f'"ts": "2024-0{i % 9 + 1}-1{i % 9}T0{i % 9}:3{i % 5}:00Z"',
            f'"mail": "user{i}@example.com"',
            f'"ip": "10.0.{i % 250}.{i % 9}"',
            f'"free": "just text {i}"',
        ]
        if i % 4 == 0:
            # one near-miss so 'mail' is NOT 100% date-time etc.
            parts.append(f'"link": "https://example.org/p/{i}"')
        rows.append((i, "{" + ", ".join(parts) + "}"))
    return spark.createDataFrame(rows, "doc_id int, doc string")


def test_string_format_profile_counts(fmt_corpus):
    got = {(r.prop, r.format): (r.n_match, r.n_strings)
           for r in string_format_profile(fmt_corpus).collect()}
    assert got[("ts", "date-time")] == (40, 40)
    assert got[("ts", "date")] == (0, 40)
    assert got[("mail", "email")] == (40, 40)
    assert got[("ip", "ipv4")] == (40, 40)
    assert got[("link", "uri")] == (10, 10)
    assert got[("free", "email")] == (0, 40)
    # every string prop gets exactly one row per battery entry
    props = {p for (p, _) in got}
    assert props == {"ts", "mail", "ip", "free", "link"}
    assert len(got) == len(props) * len(FORMAT_BATTERY)


def test_string_format_profile_is_jvm_only(fmt_corpus):
    out = string_format_profile(fmt_corpus)
    phys = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in phys
    assert phys.count("Exchange hashpartitioning") <= 1


def test_infer_detect_formats_round_trip(spark, fmt_corpus):
    """Format inference annotates all-matching string props with the
    most specific battery entry, and the compiled schema then REJECTS
    a doc violating the inferred format."""
    from json_schema_spark.validator.json_column import json_violations

    schema = infer_json_schema(fmt_corpus, detect_formats=True)
    props = schema["properties"]
    assert props["ts"] == {"type": "string", "format": "date-time"}
    assert props["mail"] == {"type": "string", "format": "email"}
    assert props["ip"] == {"type": "string", "format": "ipv4"}
    assert props["link"] == {"type": "string", "format": "uri"}
    assert "format" not in props["free"]
    assert "format" not in props["id"]
    ok = json_violations(fmt_corpus, schema, column="doc",
                         id_col="doc_id")
    assert ok.count() == 0
    bad = spark.createDataFrame(
        [(999, '{"id": 1, "ts": "not-a-date", '
               '"mail": "a@b.com", "ip": "1.2.3.4", "free": "x"}')],
        "doc_id int, doc string")
    viol = json_violations(bad, schema, column="doc", id_col="doc_id")
    assert viol.count() >= 1


def test_infer_compile_validate_round_trip(spark, corpus):
    """The inferred schema accepts every document it came from."""
    from json_schema_spark.validator.json_column import json_violations

    schema = infer_json_schema(corpus)
    bad = spark.createDataFrame(
        [(999, '{"name": "no-id"}'),
         (1000, '{"id": "not-an-int", "name": "x"}')],
        "doc_id int, doc string")
    ok = json_violations(corpus.filter(F.col("doc").isNotNull()),
                         schema, column="doc", id_col="doc_id")
    assert ok.count() == 0
    viol = json_violations(bad, schema, column="doc", id_col="doc_id")
    assert viol.count() == 2
