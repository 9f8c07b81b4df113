"""Schema INFERENCE over a JSON column — the inverse of validation.

The reference library (agavazov/json-schema) only checks documents
against a hand-written schema. At 10^12-document scale the schema
itself is usually unknown or drifting, so a validation engine needs
the reverse arrow too: scan the corpus once, profile every top-level
property's observed types and presence, and emit a draft-07 schema
that the existing constraint compiler (constraints/compiler.py) can
turn straight back into Catalyst predicates. infer -> compile ->
validate closes the loop with zero human input.

Scale story: `json_field_profile` is ONE projection (variant parse +
map explode + type classification, all JVM-side expressions) and ONE
hash aggregate keyed on (prop, jtype). Output cardinality is the
corpus's schema vocabulary — thousands of rows at most, regardless of
corpus size — so the driver-side collect in `infer_json_schema` is
bounded the same way drift baselines and IVF centroid pools are.
Partial aggregation collapses each task's repeated (prop, jtype)
pairs map-side; the shuffle carries vocabulary cardinality, not rows.

Type normalization: Spark's variant reports JSON numbers as
BIGINT/INT (integral) or DECIMAL/DOUBLE (fractional); both map to
JSON-schema "integer" / "number" — DECIMAL with scale 0 counts as
integer, anything with a fractional part as number. Objects may print
as OBJECT<...> or STRUCT<...> depending on version; both map to
"object". VOID (JSON null) maps to "null".
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["json_field_profile", "infer_json_schema"]


def _jtype(st: Column) -> Column:
    """JSON-schema type name for a schema_of_variant() DDL string."""
    return (
        F.when(st.startswith("BOOLEAN"), F.lit("boolean"))
        .when(st.startswith("VOID"), F.lit("null"))
        .when(st.startswith("STRING"), F.lit("string"))
        .when(st.startswith("ARRAY"), F.lit("array"))
        .when(st.startswith("OBJECT") | st.startswith("STRUCT")
              | st.startswith("MAP"), F.lit("object"))
        .when(st.rlike(r"^DECIMAL\([0-9]+,0\)$")
              | st.startswith("BIGINT") | st.startswith("INT")
              | st.startswith("SMALLINT") | st.startswith("TINYINT"),
              F.lit("integer"))
        .when(st.startswith("DECIMAL") | st.startswith("DOUBLE")
              | st.startswith("FLOAT"), F.lit("number"))
        .otherwise(F.lit("other")))


def json_field_profile(df: DataFrame,
                       json_col: str = "doc") -> DataFrame:
    """(prop, jtype, n): observed JSON-schema type counts for every
    top-level property of a JSON-string column. Object keys are
    unique within a document, so ``n`` is both value count and
    document count. Malformed / non-object documents contribute no
    rows (the parse yields a NULL map, explode drops it) — run the
    corpus through validate_json_dynamic first if you need them
    surfaced as violations."""
    m = F.from_json(F.col(json_col), "map<string, variant>")
    pairs = (df.filter(F.col(json_col).isNotNull())
             .select(F.explode(m).alias("prop", "_v")))
    return (pairs
            .select("prop",
                    _jtype(F.schema_of_variant(F.col("_v")))
                    .alias("jtype"))
            .groupBy("prop", "jtype")
            .agg(F.count(F.lit(1)).alias("n")))


def infer_json_schema(df: DataFrame, json_col: str = "doc",
                      total: int | None = None) -> dict[str, Any]:
    """Draft-07 object schema inferred from the corpus: one
    ``properties`` entry per observed top-level property (type, or a
    sorted type union when mixed), ``required`` for properties
    present in EVERY document. The profile aggregate is the only
    corpus pass; ``total`` skips the count when the caller already
    knows it.

    The result feeds constraints/compiler.compile_schema directly —
    see tests/test_infer.py for the infer -> compile -> validate
    round trip asserting zero violations on the originating corpus.
    """
    rows = json_field_profile(df, json_col).collect()
    if total is None:
        total = df.filter(F.col(json_col).isNotNull()).count()
    by_prop: dict[str, dict[str, int]] = {}
    for r in rows:
        by_prop.setdefault(r["prop"], {})[r["jtype"]] = r["n"]
    properties: dict[str, Any] = {}
    required: list[str] = []
    for prop in sorted(by_prop):
        types = sorted(by_prop[prop])
        properties[prop] = {
            "type": types[0] if len(types) == 1 else types}
        if sum(by_prop[prop].values()) == total:
            required.append(prop)
    schema: dict[str, Any] = {"type": "object",
                              "properties": properties}
    if required:
        schema["required"] = required
    return schema
