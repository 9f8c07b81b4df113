"""Hybrid JSON validation: route each schema to the fastest capable path.

A JSON-string column can be validated two ways:
- the DOCUMENT path (validator/json_column.py): full draft-7 semantics,
  Arrow-batched Python — handles everything, costs Python time;
- the COLUMNAR path: `from_json` into a typed struct + the Catalyst
  constraint compiler — zero Python, whole-stage codegen, 10-50x the
  throughput — but only expresses flat object schemas with scalar-typed
  properties and SQL-representable keywords.

`validate_json_auto` decides per SCHEMA (driver-side, once): if the
schema is columnar-expressible it compiles to the fast path, otherwise
it falls back to the document path. Malformed JSON, non-object roots,
and numeric/boolean field-type mismatches are caught JVM-side via the
corrupt-record column and fail like the document path. Remaining
caveats of the fast path, inherent to Jackson/SQL:
- a JSON `null` and an ABSENT key both become SQL NULL, so `required`
  rejects explicit nulls that the document path (PHP property_exists
  semantics) would accept;
- Jackson coerces ANY JSON value to text for string-declared fields, so
  `{"text": 123}` passes a `type: string` check the document path would
  fail.
Pick the document path when those distinctions matter.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from json_schema_spark.constraints.spec import ConstraintSet

# integer parses as DOUBLE on purpose: the constraint compiler's type
# check then becomes `col == floor(col)`, which accepts JSON 1.0 as an
# integer (the reference's numeric-unification rule, Check.php:23-41)
# and rejects 1.5 — LongType parsing would mark BOTH corrupt. Beyond
# 2^53 double loses exactness; at that magnitude bounds checks are
# approximate (documented, matches typical JSON number handling).
_SCALAR_TYPE_MAP = {
    "string": T.StringType(),
    "integer": T.DoubleType(),
    "number": T.DoubleType(),
    "boolean": T.BooleanType(),
}

# struct field that captures Jackson parse failures; name is unlikely to
# collide with real JSON properties
_CORRUPT = "__jss_corrupt__"

# keywords the columnar compiler expresses with identical verdicts for
# scalar-typed, flat object schemas
_COLUMNAR_KEYWORDS = {
    "type", "enum", "const", "minLength", "maxLength", "pattern",
    "format", "minimum", "maximum", "exclusiveMinimum",
    "exclusiveMaximum", "multipleOf",
}


def _property_spark_type(spec: Any) -> T.DataType | None:
    if not isinstance(spec, dict):
        return None
    t = spec.get("type")
    types = [t] if isinstance(t, str) else (t or [])
    non_null = [x for x in types if x != "null"]
    if len(non_null) == 1 and non_null[0] in _SCALAR_TYPE_MAP:
        return _SCALAR_TYPE_MAP[non_null[0]]
    if not types and set(spec) <= {"enum", "const", "minLength",
                                   "maxLength", "pattern", "format"}:
        return T.StringType()  # string-ish keywords imply string checks
    return None


def columnar_plan(
    schema: dict,
) -> tuple[T.StructType, ConstraintSet, list[str]] | None:
    """(struct type for from_json, ConstraintSet, bare-required keys)
    when the schema is fast-path-expressible, else None."""
    if not isinstance(schema, dict):
        return None
    # The fast path maps "unparseable or non-object document" to a NULL
    # struct and fails it. That verdict is only correct when the schema
    # explicitly demands an object: with `type` ABSENT, JSON Schema
    # accepts scalars/arrays (required/properties are ignored for
    # non-objects), which the NULL-struct encoding can't distinguish
    # from malformed input — so absent type routes to the document path.
    if schema.get("type") != "object":
        return None
    unsupported = set(schema) - {"type", "properties", "required",
                                 "additionalProperties", "$schema",
                                 "title", "description"}
    if unsupported:
        return None
    props = schema.get("properties", {})
    if not isinstance(props, dict) or not props:
        return None

    fields, columns = [], {}
    for name, spec in props.items():
        if not isinstance(spec, dict):
            return None
        if set(spec) - _COLUMNAR_KEYWORDS - {"default"}:
            return None
        dtype = _property_spark_type(spec)
        if dtype is None:
            return None
        fields.append(T.StructField(name, dtype))
        col_spec = {k: v for k, v in spec.items()
                    if k in _COLUMNAR_KEYWORDS or k == "default"}
        # JSON Schema validates only PRESENT properties; absent keys parse
        # to SQL NULL, so every property type is null-tolerant here and
        # presence is enforced solely by `required`
        if "type" in col_spec:
            t = col_spec["type"]
            types = [t] if isinstance(t, str) else list(t)
            if "null" not in types:
                types = types + ["null"]
            col_spec["type"] = types
        columns[name] = col_spec
    for req in schema.get("required", []):
        if req in columns:
            columns[req]["required"] = True
    # required keys WITHOUT a property spec are presence-probed straight
    # off the JSON (get_json_object) in validate_json_auto — their value
    # type is unknown, so they can't join the struct parse
    bare_required = [r for r in schema.get("required", [])
                     if r not in props]
    return T.StructType(fields), ConstraintSet(columns=columns,
                                               name="json_fast_path"), \
        bare_required


def validate_json_auto(df: DataFrame, schema: dict,
                       column: str | Column = "json",
                       id_col: str = "id",
                       version: str = "7") -> DataFrame:
    """(id, valid) per document, by the fastest capable path."""
    col = F.col(column) if isinstance(column, str) else column
    plan = columnar_plan(schema)
    if plan is None:
        from json_schema_spark.validator.json_column import (
            validate_json_column)
        out = validate_json_column(df, schema, column, version)
        return out.select(F.col(id_col),
                          F.col("_validation.valid").alias("valid"))

    struct_type, cset, bare_required = plan
    from json_schema_spark.constraints.compiler import compile_constraints

    # PERMISSIVE from_json never returns a NULL struct — malformed JSON,
    # non-object roots ('42', '[1,2,3]', 'null', '"s"'), and per-field
    # numeric/boolean type mismatches all surface ONLY through the
    # corrupt-record column. The schema demands type=object
    # (columnar_plan gate), so corrupt != NULL fails the document,
    # matching the document path's parse/type verdicts.
    parse_type = T.StructType(
        list(struct_type.fields) + [T.StructField(_CORRUPT, T.StringType())])
    parsed = df.withColumn(
        "_doc",
        F.from_json(col, parse_type,
                    {"columnNameOfCorruptRecord": _CORRUPT}))
    flat = parsed.select(
        F.col(id_col),
        col.alias("_raw_json"),
        F.col(f"_doc.{_CORRUPT}").isNull().alias("_parsed"),
        *[F.col(f"_doc.{f.name}").alias(f.name)
          for f in struct_type.fields])
    compiled = compile_constraints(cset, flat.schema)
    ok = F.col("_parsed")
    for c in compiled:
        ok = ok & c.predicate
    for req in bare_required:
        ok = ok & F.get_json_object(F.col("_raw_json"),
                                    f"$.{req}").isNotNull()
    return flat.select(F.col(id_col), ok.alias("valid"))


def is_fast_path(schema: dict) -> bool:
    return columnar_plan(schema) is not None
