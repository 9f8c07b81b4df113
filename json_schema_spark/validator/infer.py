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

__all__ = ["json_field_profile", "string_format_profile",
           "infer_json_schema", "FORMAT_BATTERY"]

# (format-name, anchored regex) battery for string-property format
# inference, most-specific first — the detection rule in
# infer_json_schema picks the FIRST battery entry that every observed
# string matches. Regexes are the Java/RE2 common subset (no
# backreferences, no lookaround) so the DuckDB oracle replays them
# verbatim; date/time entries reuse the validator's format registry
# (constraints/formats.py, mirroring Check.php:95,111,127), the rest
# are deliberately simple PROFILE shapes: inference emits a format
# *hint* for the compiler, whose registry then enforces the precise
# reference semantics at validation time.
FORMAT_BATTERY: tuple[tuple[str, str], ...] = (
    ("date-time",
     r"^([0-9]+)-(0[1-9]|1[012])-(0[1-9]|[12][0-9]|3[01])"
     r"[Tt]([01][0-9]|2[0-3]):([0-5][0-9]):([0-5][0-9])(\.[0-9]+)?"
     r"(([Zz])|([+\-]([01][0-9]|2[0-3]):[0-5][0-9]))$"),
    ("date", r"^([0-9]+)-(0[1-9]|1[012])-(0[1-9]|[12][0-9]|3[01])$"),
    ("time",
     r"^([01][0-9]|2[0-3]):([0-5][0-9]):([0-5][0-9])(\.[0-9]+)?"
     r"(([Zz])|([+\-]([01][0-9]|2[0-3]):[0-5][0-9]))$"),
    ("uuid",
     r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
     r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"),
    ("ipv4",
     r"^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
     r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"),
    ("email",
     r"^[A-Za-z0-9.!#$%&'*+/=?^_`{|}~\-]+@"
     r"(([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]*[a-zA-Z0-9])\.)+"
     r"([A-Za-z0-9]|[A-Za-z0-9][A-Za-z0-9\-]*[A-Za-z0-9])$"),
    ("uri", r"^[A-Za-z][A-Za-z0-9+.\-]*://[^ ]+$"),
)


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


def string_format_profile(df: DataFrame,
                          json_col: str = "doc") -> DataFrame:
    """(prop, format, n_match, n_strings, frac): how many of each
    top-level STRING property's values match each FORMAT_BATTERY
    regex. The schema-inference companion to json_field_profile —
    at corpus scale a column that is 100% RFC3339 date-times should
    come back as {"type": "string", "format": "date-time"}, not just
    "string".

    Plan: the same single explode as json_field_profile, one hash
    aggregate keyed on prop computing COUNT plus one conditional SUM
    per battery entry (a constant ~7 aggregate expressions — nothing
    scales with the corpus or the schema), then a stack() unpivot of
    the per-format sums into long form. Output cardinality is
    |string props| x |battery|: driver-safe at any corpus size.
    Zero Python; every regex is codegen'd rlike."""
    m = F.from_json(F.col(json_col), "map<string, variant>")
    pairs = (df.filter(F.col(json_col).isNotNull())
             .select(F.explode(m).alias("prop", "_v")))
    strings = (pairs
               .filter(F.schema_of_variant(F.col("_v"))
                       .startswith("STRING"))
               .select("prop",
                       F.try_variant_get(F.col("_v"), "$", "string")
                       .alias("_s")))
    sums = [F.sum(F.col("_s").rlike(rx).cast("long"))
            .alias(f"_m{i}")
            for i, (_, rx) in enumerate(FORMAT_BATTERY)]
    wide = (strings.groupBy("prop")
            .agg(F.count(F.lit(1)).alias("n_strings"), *sums))
    stack_args: list[Column] = []
    for i, (name, _) in enumerate(FORMAT_BATTERY):
        stack_args += [F.lit(name), F.col(f"_m{i}")]
    return (wide
            .select("prop", "n_strings",
                    F.stack(F.lit(len(FORMAT_BATTERY)), *stack_args)
                    .alias("format", "n_match"))
            .select("prop", "format", "n_match", "n_strings",
                    F.round(F.col("n_match") / F.col("n_strings"), 6)
                    .alias("frac")))


def infer_json_schema(df: DataFrame, json_col: str = "doc",
                      total: int | None = None,
                      detect_formats: bool = False) -> dict[str, Any]:
    """Draft-07 object schema inferred from the corpus: one
    ``properties`` entry per observed top-level property (type, or a
    sorted type union when mixed), ``required`` for properties
    present in EVERY document. The profile aggregate is the only
    corpus pass; ``total`` skips the count when the caller already
    knows it.

    With ``detect_formats`` the string-format profile runs as a
    second bounded pass and any all-string property whose EVERY
    observed value matches one FORMAT_BATTERY regex gains a
    ``format`` annotation (first matching battery entry wins — the
    battery is ordered most-specific first, so a column of RFC3339
    timestamps infers "date-time", not "uri").

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
    fmt_by_prop: dict[str, str] = {}
    if detect_formats:
        order = {name: i for i, (name, _) in enumerate(FORMAT_BATTERY)}
        frows = string_format_profile(df, json_col).collect()
        for r in sorted(frows, key=lambda r: (r["prop"],
                                              order[r["format"]])):
            if (r["n_strings"] > 0 and r["n_match"] == r["n_strings"]
                    and r["prop"] not in fmt_by_prop):
                fmt_by_prop[r["prop"]] = r["format"]
    for prop in sorted(by_prop):
        types = sorted(by_prop[prop])
        properties[prop] = {
            "type": types[0] if len(types) == 1 else types}
        if types == ["string"] and prop in fmt_by_prop:
            properties[prop]["format"] = fmt_by_prop[prop]
        if sum(by_prop[prop].values()) == total:
            required.append(prop)
    schema: dict[str, Any] = {"type": "object",
                              "properties": properties}
    if required:
        schema["required"] = required
    return schema
