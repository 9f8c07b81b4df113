"""Keyword → Catalyst Column compiler.

Each (column, keyword) pair compiles to a named boolean predicate
(True = pass) plus an "observed value" expression for violation rows.
Everything stays JVM-side (whole-stage codegen) except the pandas-UDF
formats — per the design invariant (SURVEY.md §7): no per-row Python.

Null discipline (SQL three-valued logic vs the reference's exceptions):
every emitted predicate is wrapped so it can never evaluate to NULL —
`coalesce(pred, False)` — mirroring the reference's hard verdicts
(/root/reference/src/Validator.php throws on failure; we emit a violation).

JSON-Schema applicability rule: a keyword constrains only values of its
applicable type (e.g. minLength only strings — Validator.php:580-596 is
inside the string branch of the gettype dispatch at :119-171). With a typed
Spark schema, applicability is decided statically at compile time: a
minLength on an integer column compiles to *no* constraint at all, and a
NULL value passes every keyword except `required` and non-null `type`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from operator import and_, or_
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from json_schema_spark.constraints.formats import format_predicate
from json_schema_spark.errors import SchemaError

BASE64_RX = r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"


@dataclass(frozen=True)
class CompiledConstraint:
    constraint_id: str  # e.g. "text.minLength"
    column: str         # source column name
    predicate: Column   # boolean, never NULL; True = pass
    observed: Column    # string rendering of the offending value


# ---------------------------------------------------------------------------
# Spark type → JSON-type classification
# ---------------------------------------------------------------------------

def _json_type(dtype: T.DataType) -> str:
    if isinstance(dtype, T.StringType):
        return "string"
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "integer"
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "number"
    if isinstance(dtype, T.ArrayType):
        return "array"
    if isinstance(dtype, (T.StructType, T.MapType)):
        return "object"
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    if isinstance(dtype, T.BinaryType):
        return "binary"
    if isinstance(dtype, T.TimestampType):
        return "timestamp"
    if isinstance(dtype, T.DateType):
        return "date"
    return "unknown"


def _is_numeric(dtype: T.DataType) -> bool:
    return _json_type(dtype) in ("integer", "number")


def _observed(col: Column, dtype: T.DataType) -> Column:
    """Render the offending value as a string for the violations sink."""
    if isinstance(dtype, T.BinaryType):
        return F.base64(col)
    if isinstance(dtype, (T.ArrayType, T.StructType, T.MapType)):
        return F.to_json(col)
    return col.cast("string")


def _never_null(pred: Column) -> Column:
    return F.coalesce(pred, F.lit(False))


def _pass_on_null(col: Column, pred: Column) -> Column:
    """JSON-Schema keywords ignore missing/null values (except required/type)."""
    return _never_null(col.isNull() | pred)


# ---------------------------------------------------------------------------
# Per-keyword predicate builders. Each returns Column|None
# (None = statically inapplicable to this Spark type → no constraint).
# ---------------------------------------------------------------------------

def _type_pred(col: Column, dtype: T.DataType, arg: Any) -> Column | None:
    types = [arg] if isinstance(arg, str) else list(arg)
    types = [t.lower() for t in types]
    jt = _json_type(dtype)
    null_ok = "null" in types

    if jt in ("number", "integer"):
        # numeric unification (Check.php:23-41, Validator.php:205-216):
        # integer always satisfies number; a fraction-free float satisfies
        # integer (the 1.0-is-an-integer rule).
        if "number" in types or (jt == "integer" and "integer" in types):
            value_ok = F.lit(True)
        elif "integer" in types:
            value_ok = col == F.floor(col)
        else:
            value_ok = F.lit(False)
    else:
        value_ok = F.lit(jt in types)

    if null_ok:
        return _never_null(col.isNull() | value_ok)
    return _never_null(col.isNotNull() & value_ok)


def _enum_canon(v: Any) -> Any:
    # deep-equality canonicalization is only needed for composite values;
    # scalars compare natively (Helper.php:128-135: numbers numerically)
    return v


def _additional_items_pred(col: Column, dtype: T.DataType,
                           spec: dict[str, Any],
                           path: str) -> Column | None:
    """additionalItems is only meaningful alongside tuple-form items
    (Validator.php:1258-1284): False forbids elements beyond the tuple;
    a schema constrains every element past the tuple prefix."""
    arg = spec.get("additionalItems")
    items = spec.get("items")
    if arg is None or arg is True or not isinstance(items, list):
        return None
    if not isinstance(dtype, T.ArrayType):
        return None
    n = len(items)
    if arg is False:
        return _pass_on_null(col, F.size(col) <= n)
    extra = F.slice(col, n + 1, F.greatest(F.size(col) - n, F.lit(0)))
    return _pass_on_null(
        col,
        F.forall(extra, lambda e: _spec_predicate(
            e, dtype.elementType, arg, f"{path}/additionalItems")))


def _canonicalize_spec(spec: dict[str, Any]) -> dict[str, Any]:
    """Draft-4 boolean exclusive form ({"minimum": m,
    "exclusiveMinimum": true} — Validator.php:756-780) rewritten to the
    draft-6+ numeric form before compilation; a bare boolean flag with
    no sibling bound constrains nothing."""
    out = spec
    for kw, bound in (("exclusiveMinimum", "minimum"),
                      ("exclusiveMaximum", "maximum")):
        if isinstance(spec.get(kw), bool):
            if out is spec:
                out = dict(spec)
            flag = out.pop(kw)
            if flag and bound in out:
                out[kw] = out.pop(bound)
    return out


def _spec_predicate(col: Column, dtype: T.DataType,
                    spec: dict[str, Any], path: str) -> Column:
    """AND of every keyword predicate in a (sub-)spec — used standalone by
    combinators; always null-disciplined."""
    spec = _canonicalize_spec(spec)
    preds = []
    for kw, arg in spec.items():
        built = _keyword_predicate(kw, col, dtype, arg, path)
        if built is not None:
            preds.append(built)
    ai = _additional_items_pred(col, dtype, spec, path)
    if ai is not None:
        preds.append(ai)
    if not preds:
        return F.lit(True)
    return _never_null(reduce(and_, preds))


def _keyword_predicate(kw: str, col: Column, dtype: T.DataType,
                       arg: Any, path: str) -> Column | None:
    jt = _json_type(dtype)

    if kw == "required":
        return _never_null(col.isNotNull()) if arg else None

    if kw == "type":
        return _type_pred(col, dtype, arg)

    if kw == "const":
        if isinstance(arg, (dict, list)):
            return _pass_on_null(col, F.to_json(col) == F.lit(
                __import__("json").dumps(arg, separators=(",", ":"))))
        if arg is None:
            return _never_null(col.isNull())
        return _pass_on_null(col, col == F.lit(arg))

    if kw == "enum":
        scalars = [v for v in arg if not isinstance(v, (dict, list))]
        composites = [v for v in arg if isinstance(v, (dict, list))]
        preds = []
        if scalars:
            non_null = [v for v in scalars if v is not None]
            if non_null:
                preds.append(col.isin(non_null))
            if any(v is None for v in scalars):
                preds.append(col.isNull())
        if composites and jt in ("array", "object"):
            import json as _json
            canon = [_json.dumps(v, separators=(",", ":")) for v in composites]
            preds.append(F.to_json(col).isin(canon))
        if not preds:
            return _never_null(col.isNull())
        return _pass_on_null(col, reduce(or_, preds))

    # ---- string keywords (Validator.php:580-713) ----
    if kw in ("minLength", "maxLength", "pattern", "format",
              "contentEncoding", "contentMediaType"):
        if jt != "string":
            return None
        if kw == "minLength":
            return _pass_on_null(col, F.length(col) >= int(arg))
        if kw == "maxLength":
            return _pass_on_null(col, F.length(col) <= int(arg))
        if kw == "pattern":
            # rlike = partial match, same as preg_match (Validator.php:636)
            return _pass_on_null(col, col.rlike(arg))
        if kw == "format":
            return format_predicate(arg, col)
        if kw == "contentEncoding":
            if arg == "base64":
                return _pass_on_null(col, col.rlike(BASE64_RX))
            raise SchemaError(f"unsupported contentEncoding {arg!r}", path)
        if kw == "contentMediaType":
            if arg == "application/json":
                return _pass_on_null(col, F.try_parse_json(col).isNotNull())
            raise SchemaError(f"unsupported contentMediaType {arg!r}", path)

    # ---- numeric keywords (Validator.php:721-900) ----
    if kw in ("minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum",
              "multipleOf"):
        if not _is_numeric(dtype):
            return None
        lit = F.lit(arg)
        if kw == "minimum":
            return _pass_on_null(col, col >= lit)
        if kw == "maximum":
            return _pass_on_null(col, col <= lit)
        if kw == "exclusiveMinimum":
            return _pass_on_null(col, col > lit)
        if kw == "exclusiveMaximum":
            return _pass_on_null(col, col < lit)
        if kw == "multipleOf":
            if arg == 0:
                return None  # 0 always passes (Validator.php:731-733)
            if jt == "integer" and float(arg).is_integer():
                return _pass_on_null(col, F.pmod(col, F.lit(int(arg))) == 0)
            # float remainder via decimal rescaling — mirrors the
            # power-of-10 multiplier trick (Validator.php:736-747) so
            # 0.0075 % 0.0001 style cases verdict identically
            dec = T.DecimalType(38, 12)
            c = col.cast(dec)
            m = F.lit(arg).cast(dec)
            return _pass_on_null(col, (c % m) == F.lit(0).cast(dec))

    # ---- array keywords (Validator.php:1226-1410) ----
    if kw in ("items", "contains", "minItems", "maxItems", "uniqueItems",
              "additionalItems"):
        if jt != "array":
            return None
        elem_t = dtype.elementType
        if kw == "minItems":
            return _pass_on_null(col, F.size(col) >= int(arg))
        if kw == "maxItems":
            return _pass_on_null(col, F.size(col) <= int(arg))
        if kw == "uniqueItems":
            if not arg:
                return None
            return _pass_on_null(
                col, F.size(col) == F.size(F.array_distinct(col)))
        if kw == "items":
            if isinstance(arg, list):  # tuple form: per-index schemas
                preds = []
                for i, sub in enumerate(arg):
                    e = F.element_at(col, i + 1)
                    preds.append(
                        (F.size(col) < i + 1)
                        | _spec_predicate(e, elem_t, sub, f"{path}/items[{i}]"))
                return _pass_on_null(col, reduce(and_, preds))
            return _pass_on_null(
                col,
                F.forall(col, lambda e: _spec_predicate(
                    e, elem_t, arg, f"{path}/items")))
        if kw == "contains":
            return _pass_on_null(
                col,
                F.exists(col, lambda e: _spec_predicate(
                    e, elem_t, arg, f"{path}/contains")))
        if kw == "additionalItems":
            # standalone (no sibling tuple-form items) it constrains
            # nothing; the tuple-items interplay is compiled by
            # _additional_items_pred from the spec level
            return None

    # ---- object keywords on struct/map columns (Validator.php:909-1183) ----
    if kw in ("properties", "requiredProperties", "minProperties",
              "maxProperties", "propertyNames", "patternProperties",
              "additionalProperties"):
        if isinstance(dtype, T.StructType):
            return _struct_object_pred(kw, col, dtype, arg, path)
        if isinstance(dtype, T.MapType):
            return _map_object_pred(kw, col, dtype, arg, path)
        return None

    # ---- combinators (Validator.php:280-572) ----
    if kw == "allOf":
        return _never_null(reduce(and_, [
            _spec_predicate(col, dtype, sub, f"{path}/allOf[{i}]")
            for i, sub in enumerate(arg)]))
    if kw == "anyOf":
        return _never_null(reduce(or_, [
            _spec_predicate(col, dtype, sub, f"{path}/anyOf[{i}]")
            for i, sub in enumerate(arg)]))
    if kw == "oneOf":
        flags = [
            _spec_predicate(col, dtype, sub, f"{path}/oneOf[{i}]").cast("int")
            for i, sub in enumerate(arg)]
        return _never_null(reduce(Column.__add__, flags) == 1)
    if kw == "not":
        return _never_null(~_spec_predicate(col, dtype, arg, f"{path}/not"))
    if kw == "if":
        return None  # folded below with then/else
    if kw in ("then", "else"):
        return None

    if kw in ("default", "dependencies"):
        return None  # handled at the set level / as rewrites

    raise SchemaError(f"keyword {kw!r} not applicable to {dtype.simpleString()}",
                      path)


def _struct_object_pred(kw: str, col: Column, dtype: T.StructType,
                        arg: Any, path: str) -> Column | None:
    names = [f.name for f in dtype.fields]
    types = {f.name: f.dataType for f in dtype.fields}
    if kw == "properties":
        preds = []
        for name, sub in arg.items():
            if name not in types:
                continue  # closed world: unknown fields handled at set level
            preds.append(_spec_predicate(
                col.getField(name), types[name], sub, f"{path}/properties/{name}"))
        if not preds:
            return None
        return _pass_on_null(col, reduce(and_, preds))
    if kw == "requiredProperties":
        missing_is_error = [
            col.getField(n).isNotNull() if n in types else F.lit(False)
            for n in arg]
        return _pass_on_null(col, reduce(and_, missing_is_error))
    if kw == "minProperties":
        cnt = reduce(Column.__add__,
                     [col.getField(n).isNotNull().cast("int") for n in names])
        return _pass_on_null(col, cnt >= int(arg))
    if kw == "maxProperties":
        cnt = reduce(Column.__add__,
                     [col.getField(n).isNotNull().cast("int") for n in names])
        return _pass_on_null(col, cnt <= int(arg))
    if kw == "propertyNames":
        # struct field names are static → compile-time constant verdict
        ok = all(_static_name_ok(n, arg) for n in names)
        return F.lit(ok)
    return None


def _map_object_pred(kw: str, col: Column, dtype: T.MapType,
                     arg: Any, path: str) -> Column | None:
    val_t = dtype.valueType
    if kw == "minProperties":
        return _pass_on_null(col, F.size(col) >= int(arg))
    if kw == "maxProperties":
        return _pass_on_null(col, F.size(col) <= int(arg))
    if kw == "requiredProperties":
        return _pass_on_null(col, reduce(and_, [
            F.element_at(col, k).isNotNull() for k in arg]))
    if kw == "propertyNames":
        sub = arg if isinstance(arg, dict) else {}
        return _pass_on_null(col, F.forall(
            F.map_keys(col),
            lambda k: _spec_predicate(k, T.StringType(), sub,
                                      f"{path}/propertyNames")))
    if kw == "properties":
        preds = []
        for name, sub in arg.items():
            v = F.element_at(col, name)
            preds.append(v.isNull() | _spec_predicate(
                v, val_t, sub, f"{path}/properties/{name}"))
        return _pass_on_null(col, reduce(and_, preds))
    if kw == "patternProperties":
        preds = []
        for rx, sub in arg.items():
            # apply sub-spec to every value whose key matches rx
            matched = F.map_filter(col, lambda k, v: k.rlike(rx))
            preds.append(F.forall(
                F.map_values(matched),
                lambda v: _spec_predicate(v, val_t, sub,
                                          f"{path}/patternProperties")))
        return _pass_on_null(col, reduce(and_, preds))
    if kw == "additionalProperties":
        if arg is True:
            return None
        declared = list((arg or {}).get("_declared", [])) if isinstance(arg, dict) else []
        if arg is False and declared:
            extra = F.filter(F.map_keys(col),
                             lambda k: ~k.isin(declared))
            return _pass_on_null(col, F.size(extra) == 0)
        return None
    return None


def _static_name_ok(name: str, spec: dict[str, Any]) -> bool:
    import re
    if "minLength" in spec and len(name) < spec["minLength"]:
        return False
    if "maxLength" in spec and len(name) > spec["maxLength"]:
        return False
    if "pattern" in spec and not re.search(spec["pattern"], name):
        return False
    return True


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------

def compile_constraints(cset, schema: T.StructType) -> list[CompiledConstraint]:
    """Compile a ConstraintSet against a table schema into named predicates.

    Emits one CompiledConstraint per (column, top-level keyword) so the
    violations sink can attribute failures — the evaluate-all inversion of
    the reference's fail-fast ValidationException (Validator.php:228-235).
    """
    by_name = {f.name: f.dataType for f in schema.fields}
    out: list[CompiledConstraint] = []

    for col_name, spec in cset.columns.items():
        if col_name not in by_name:
            # missing column: `required` → always-fail constraint; other
            # keywords are vacuous (the column can never violate them)
            if spec.get("required"):
                out.append(CompiledConstraint(
                    f"{col_name}.required", col_name,
                    F.lit(False), F.lit(None).cast("string")))
            continue
        dtype = by_name[col_name]
        col = F.col(col_name)
        obs = _observed(col, dtype)
        spec = _canonicalize_spec(spec)

        # if/then/else folds to a single conditional predicate
        # (Validator.php:280-335; F.when keeps it a pure expression)
        if "if" in spec:
            if_p = _spec_predicate(col, dtype, spec["if"], f"#{col_name}/if")
            then_p = (_spec_predicate(col, dtype, spec["then"],
                                      f"#{col_name}/then")
                      if "then" in spec else F.lit(True))
            else_p = (_spec_predicate(col, dtype, spec["else"],
                                      f"#{col_name}/else")
                      if "else" in spec else F.lit(True))
            out.append(CompiledConstraint(
                f"{col_name}.if", col_name,
                _never_null(F.when(if_p, then_p).otherwise(else_p)), obs))

        for kw, arg in spec.items():
            if kw in ("if", "then", "else", "default", "dependencies"):
                continue
            pred = _keyword_predicate(kw, col, dtype, arg, f"#{col_name}")
            if pred is None:
                continue
            out.append(CompiledConstraint(f"{col_name}.{kw}", col_name,
                                          pred, obs))

        ai = _additional_items_pred(col, dtype, spec, f"#{col_name}")
        if ai is not None:
            out.append(CompiledConstraint(
                f"{col_name}.additionalItems", col_name, ai, obs))

        # dependencies: presence of this column implies presence/specs of
        # other columns (Validator.php:1132-1146; array form → required,
        # Schema.php:1062-1079)
        dep = spec.get("dependencies")
        if dep is not None:
            if isinstance(dep, list):
                dep_pred = reduce(and_, [
                    F.col(d).isNotNull() if d in by_name else F.lit(False)
                    for d in dep])
            else:
                dep_pred = reduce(and_, [
                    _spec_predicate(F.col(d), by_name[d], sub, f"#{col_name}/dep")
                    if d in by_name else F.lit(False)
                    for d, sub in dep.items()])
            out.append(CompiledConstraint(
                f"{col_name}.dependencies", col_name,
                _never_null(F.when(col.isNotNull(), dep_pred)
                            .otherwise(F.lit(True))), obs))

    return out
