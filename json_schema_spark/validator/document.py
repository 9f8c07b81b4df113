"""From-scratch row-level JSON Schema validator (drafts 4/6/7) with
reference-parity semantics.

This is the engine's dynamic-JSON path: for arbitrary nested documents that
the columnar compiler can't type statically, schemas compile once on the
driver (`compile_schema`) and evaluate per document (`DocumentValidator`),
batch-vectorized over Spark via the Arrow pandas-UDF wrapper in
validator/json_column.py.

Observable behavior mirrors the reference implementation
(/root/reference/src/Schema.php compile passes, src/Validator.php runtime,
src/Cast.php modes) without porting its code: the compiled form is an
immutable keyword dict with nested CompiledSchema children, evaluation is
functional (rewritten values travel through return values; dicts alias like
PHP objects, lists are copied at the validate() boundary like PHP arrays),
and the three equality relations live in validator/phpsem.py.

Keyword evaluation order and subtleties follow src/Validator.php:81-174:
boolean-schema short-circuit, default-substitution-then-stop for null data,
type (+MODE_CAST), format, if/then/else, const, enum, allOf/anyOf/oneOf/not
(with defaults suspended during speculative branches and re-applied from
the winning branch), then the per-type keyword block.
"""

from __future__ import annotations

import base64
import json
import re
from typing import Any, Callable

from json_schema_spark.errors import SchemaError, ValidationError
from json_schema_spark.validator import checks as fchecks
from json_schema_spark.validator import phpsem

MODE_CAST = 1
MODE_REMOVE_ADDITIONALS = 2
MODE_APPLY_DEFAULTS = 4

_VALID_TYPES = ("string", "number", "integer", "array", "object", "boolean",
                "null")

# transform() recursion guard: schema paths deeper than this compile to
# `true` (the reference's shared-$ref cycle cutoff, Schema.php:186-190)
_MAX_PATH_DEPTH = 100

_MISSING = object()


def _regex_valid(pattern: Any) -> bool:
    return fchecks.check_regex(pattern)


def _search(pattern: str, subject: str) -> bool:
    """preg_match('/p/', s) — partial match; invalid pattern → no match."""
    try:
        return re.search(pattern, subject) is not None
    except re.error:
        return False


class CompiledSchema:
    """One schema node: either a boolean schema or a dict of processed
    keywords, with nested positions already compiled to CompiledSchema."""

    __slots__ = ("raw", "version", "path", "kw", "_memo")

    def __init__(self, raw: Any, version: str = "7", path: str = "#",
                 _memo: dict[int, "CompiledSchema"] | None = None):
        self.version = version
        self.path = path
        # Shared raw nodes (produced by $ref resolution) compile exactly
        # once: the memo maps raw-node identity → CompiledSchema, and a
        # node registers itself BEFORE compiling children so cyclic schemas
        # (e.g. the draft meta-schemas, where every property $refs '#')
        # become cyclic CompiledSchema graphs instead of exponential trees.
        # The reference gets the same effect by replacing shared raw nodes
        # with Schema instances in place (Schema.php transform() +
        # `instanceof Schema` skips).
        self._memo = _memo if _memo is not None else {}

        if isinstance(raw, dict):
            # normalizations: a lone `additionalItems: false` is dropped,
            # and an (effectively) empty object schema becomes `true`
            keys = set(raw.keys())
            if keys == {"additionalItems"} and raw["additionalItems"] is False:
                keys = set()
            if not keys:
                self.raw = True
                self.kw = None
                return
            self.raw = raw
            self.kw = {}
            self._memo[id(raw)] = self
            self._compile(raw)
            return

        if isinstance(raw, bool):
            self.raw = raw
            self.kw = None
            return

        raise SchemaError(
            f"schema must be an object or boolean, got {phpsem.php_type(raw)}",
            path)

    # -- helpers --------------------------------------------------------
    def is_bool(self) -> bool:
        return self.kw is None

    def has(self, kw: str) -> bool:
        return self.kw is not None and kw in self.kw

    def get(self, kw: str, default: Any = None) -> Any:
        return self.kw.get(kw, default) if self.kw is not None else default

    def _child(self, node: Any, *segs) -> "CompiledSchema":
        path = self.path + "/" + "/".join(str(s) for s in segs)
        if path.count("/") > _MAX_PATH_DEPTH:
            return CompiledSchema(True, self.version, path)
        if isinstance(node, dict):
            cached = self._memo.get(id(node))
            if cached is not None:
                return cached
        return CompiledSchema(node, self.version, path, self._memo)

    def _err(self, msg: str, at: str) -> SchemaError:
        return SchemaError(msg, f"{self.path}/{at}")

    # -- compile passes (Schema.php:83-118 order) -----------------------
    def _compile(self, raw: dict) -> None:
        version = self.version
        kw = self.kw

        # type — scalar normalized to list; entries must be known strings
        if "type" in raw:
            t = raw["type"]
            types = t if isinstance(t, list) else [t]
            for entry in types:
                if not isinstance(entry, str):
                    raise self._err("type entry is not a string", "type")
                if entry not in _VALID_TYPES:
                    raise self._err(f"unknown type {entry!r}", "type")
            kw["type"] = [x.lower() for x in types]
        else:
            kw["type"] = []

        if "format" in raw:
            if not isinstance(raw["format"], str):
                raise self._err("format must be a string", "format")
            kw["format"] = raw["format"]

        if "definitions" in raw:
            if not isinstance(raw["definitions"], dict):
                raise self._err("definitions must be an object", "definitions")
            kw["definitions"] = {
                k: self._child(v, "definitions", k)
                for k, v in raw["definitions"].items()}

        # if/then/else — lone members pruned (Schema.php:299-303,326-329,
        # 351-354)
        has_if = "if" in raw
        has_then = "then" in raw
        has_else = "else" in raw
        if has_if and (has_then or has_else):
            kw["if"] = self._child(raw["if"], "if")
            if has_then:
                kw["then"] = self._child(raw["then"], "then")
            if has_else:
                kw["else"] = self._child(raw["else"], "else")

        if "const" in raw:
            kw["const"] = raw["const"]

        if "enum" in raw:
            if not isinstance(raw["enum"], list):
                raise self._err("enum must be an array", "enum")
            kw["enum"] = raw["enum"]

        for comb in ("allOf", "anyOf", "oneOf"):
            if comb in raw:
                if not isinstance(raw[comb], list):
                    raise self._err(f"{comb} must be an array", comb)
                kw[comb] = [self._child(s, comb, i)
                            for i, s in enumerate(raw[comb])]

        if "not" in raw:
            kw["not"] = self._child(raw["not"], "not")

        for name in ("minLength", "maxLength"):
            if name in raw:
                v = raw[name]
                if isinstance(v, bool) or not isinstance(v, int):
                    raise self._err(f"{name} must be an integer", name)
                if v < 0:
                    raise self._err(f"{name} must be non-negative", name)
                kw[name] = v
        if "maxLength" in kw and "minLength" in kw \
                and kw["maxLength"] < kw["minLength"]:
            raise self._err("maxLength is lower than minLength", "maxLength")

        if "pattern" in raw:
            if not isinstance(raw["pattern"], str):
                raise self._err("pattern must be a string", "pattern")
            if not _regex_valid(raw["pattern"]):
                raise self._err("pattern is not a valid regex", "pattern")
            kw["pattern"] = raw["pattern"]

        if "contentEncoding" in raw:
            if not isinstance(raw["contentEncoding"], str):
                raise self._err("contentEncoding must be a string",
                                "contentEncoding")
            kw["contentEncoding"] = raw["contentEncoding"]

        if "contentMediaType" in raw:
            if not isinstance(raw["contentMediaType"], str):
                raise self._err("contentMediaType must be a string",
                                "contentMediaType")
            if "/" not in raw["contentMediaType"]:
                raise self._err("contentMediaType is missing '/'",
                                "contentMediaType")
            kw["contentMediaType"] = raw["contentMediaType"]

        for name in ("multipleOf", "minimum", "maximum"):
            if name in raw:
                v = raw[name]
                if isinstance(v, bool) or not isinstance(v, (int, float)):
                    raise self._err(f"{name} must be numeric", name)
                kw[name] = v
        if "maximum" in kw and "minimum" in kw \
                and kw["maximum"] < kw["minimum"]:
            raise self._err("maximum is lower than minimum", "maximum")

        for name in ("exclusiveMinimum", "exclusiveMaximum"):
            if name in raw:
                v = raw[name]
                if version == "4":
                    if not isinstance(v, bool):
                        raise self._err(
                            f"{name} must be a boolean in draft 4", name)
                else:
                    if isinstance(v, bool) or not isinstance(v, (int, float)):
                        raise self._err(f"{name} must be numeric", name)
                kw[name] = v
        if version != "4":
            if "exclusiveMinimum" in kw and "minimum" in kw \
                    and kw["exclusiveMinimum"] < kw["minimum"]:
                raise self._err(
                    "exclusiveMinimum is lower than minimum",
                    "exclusiveMinimum")
            if "exclusiveMaximum" in kw and "exclusiveMinimum" in kw \
                    and kw["exclusiveMaximum"] <= kw["exclusiveMinimum"]:
                raise self._err(
                    "exclusiveMaximum does not exceed exclusiveMinimum",
                    "exclusiveMaximum")

        if "properties" in raw:
            if not isinstance(raw["properties"], dict):
                raise self._err("properties must be an object", "properties")
            kw["properties"] = {
                k: self._child(v, "properties", k)
                for k, v in raw["properties"].items()}

        if "additionalProperties" in raw:
            kw["additionalProperties"] = self._child(
                raw["additionalProperties"], "additionalProperties")

        if "required" in raw:
            if not isinstance(raw["required"], list):
                raise self._err("required must be an array", "required")
            for entry in raw["required"]:
                if not isinstance(entry, str):
                    raise self._err("required entry is not a string",
                                    "required")
            kw["required"] = raw["required"]

        if "propertyNames" in raw:
            kw["propertyNames"] = self._child(raw["propertyNames"],
                                              "propertyNames")

        for name in ("minProperties", "maxProperties"):
            if name in raw:
                v = raw[name]
                if isinstance(v, bool) or not isinstance(v, int):
                    raise self._err(f"{name} must be an integer", name)
                if v < 0:
                    raise self._err(f"{name} must be non-negative", name)
                kw[name] = v
        if "maxProperties" in kw and "minProperties" in kw \
                and kw["maxProperties"] < kw["minProperties"]:
            raise self._err("maxProperties is lower than minProperties",
                            "maxProperties")

        if "dependencies" in raw:
            if not isinstance(raw["dependencies"], dict):
                raise self._err("dependencies must be an object",
                                "dependencies")
            deps = {}
            for dkey, dval in raw["dependencies"].items():
                if isinstance(dval, list):
                    for item in dval:
                        if not isinstance(item, str):
                            raise self._err(
                                "dependency entry is not a string",
                                f"dependencies/{dkey}")
                    # array form canonicalizes to a required-schema
                    # (Schema.php:1062-1079)
                    dval = {"type": "object",
                            "additionalProperties": True,
                            "required": dval}
                deps[dkey] = self._child(dval, "dependencies", dkey)
            kw["dependencies"] = deps

        if "patternProperties" in raw:
            if not isinstance(raw["patternProperties"], dict):
                raise self._err("patternProperties must be an object",
                                "patternProperties")
            pp = {}
            for pattern, sub in raw["patternProperties"].items():
                if not _regex_valid(pattern):
                    raise self._err(
                        f"patternProperties key {pattern!r} is not a valid "
                        "regex", f"patternProperties/{pattern}")
                pp[pattern] = self._child(sub, "patternProperties", pattern)
            kw["patternProperties"] = pp

        if "items" in raw:
            items = raw["items"]
            if isinstance(items, list):
                kw["items"] = [self._child(s, "items", i)
                               for i, s in enumerate(items)]
            elif isinstance(items, (dict, bool)):
                kw["items"] = self._child(items, "items")
            else:
                raise self._err(
                    "items must be an array, object or boolean", "items")

        if "contains" in raw:
            kw["contains"] = self._child(raw["contains"], "contains")

        if "additionalItems" in raw:
            kw["additionalItems"] = self._child(raw["additionalItems"],
                                                "additionalItems")

        for name in ("minItems", "maxItems"):
            if name in raw:
                v = raw[name]
                if isinstance(v, bool) or not isinstance(v, int):
                    raise self._err(f"{name} must be an integer", name)
                if v < 0:
                    raise self._err(f"{name} must be non-negative", name)
                kw[name] = v
        if "maxItems" in kw and "minItems" in kw \
                and kw["maxItems"] < kw["minItems"]:
            raise self._err("maxItems is lower than minItems", "maxItems")

        if "uniqueItems" in raw:
            if not isinstance(raw["uniqueItems"], bool):
                raise self._err("uniqueItems must be a boolean",
                                "uniqueItems")
            kw["uniqueItems"] = raw["uniqueItems"]

        if "default" in raw:
            kw["default"] = raw["default"]


def compile_schema(schema: Any, version: str = "7",
                   resolve_refs: bool = True,
                   fetch_remote: bool = False,
                   url_cache: dict | None = None) -> CompiledSchema:
    """Driver-side eager compile (SchemaError on malformed input).

    ``schema`` is a decoded JSON value (dict/bool); pass a JSON string to
    have it decoded first. $ref/$id/definitions are resolved in a pre-pass
    (validator/refs.py) unless ``resolve_refs=False``; http(s)://file://
    refs are only downloaded when ``fetch_remote=True`` (untrusted
    schemas must not read driver-local files or probe endpoints), but a
    pre-seeded ``url_cache`` of well-known documents (e.g. the draft
    meta-schemas) is consulted either way. Draft-4 schemas spell the
    anchor keyword `id`; the resolver is told so via the version.
    The caller's schema object is never mutated.
    """
    if isinstance(schema, str):
        schema = json.loads(schema)
    if resolve_refs and isinstance(schema, (dict, list)):
        from json_schema_spark.validator.refs import resolve_refs as _rr
        id_keys = ("$id", "id") if version == "4" else ("$id",)
        schema = _rr(schema, fetch_remote=fetch_remote,
                     url_cache=url_cache, id_keys=id_keys)
    return CompiledSchema(schema, version)


class DocumentValidator:
    """Evaluate documents against a CompiledSchema.

    ``validate`` raises ValidationError on failure and returns the
    (possibly rewritten — casts/defaults/removals/content-decoding) data
    on success.
    """

    def __init__(self, mode: int = 0,
                 formats: dict[str, Callable[[Any], bool]] | None = None):
        self.mode = mode
        self.formats = {
            name: getattr(fchecks, fn)
            for name, fn in fchecks.FORMAT_FUNCS.items()}
        if formats:
            self.formats.update(formats)

    def register_format(self, format_id: str,
                        fn: Callable[[Any], bool]) -> None:
        self.formats[format_id] = fn

    # ------------------------------------------------------------------
    def validate(self, data: Any, schema: CompiledSchema) -> Any:
        if schema.is_bool():
            if schema.raw is False:
                raise ValidationError(
                    "schema is false: nothing is allowed", schema.path)
            return data

        # lists carry PHP-array value semantics: copy at the call boundary
        # so speculative branches can't leak element rewrites
        if isinstance(data, list):
            data = list(data)

        # presence checks inlined on the keyword dict: a node typically
        # carries 2-4 of the ~30 keywords, and skipping the method call
        # entirely is ~1.5x on the Arrow batch path
        kw = schema.kw

        # default substitution for null data stops all further checks
        if data is None and "default" in kw:
            return self._apply_defaults(data, schema)

        if kw["type"]:
            data = self._v_type(data, schema)
        if "format" in kw:
            self._v_format(data, schema)
        if "if" in kw:
            data = self._v_if_then_else(data, schema)
        if "const" in kw:
            self._v_const(data, schema)
        if "enum" in kw:
            self._v_enum(data, schema)
        if "allOf" in kw:
            data = self._v_all_of(data, schema)
        if "anyOf" in kw:
            data = self._v_any_of(data, schema)
        if "oneOf" in kw:
            data = self._v_one_of(data, schema)
        if "not" in kw:
            self._v_not(data, schema)

        t = phpsem.php_type(data)
        if t == "string":
            if "minLength" in kw:
                self._v_min_length(data, schema)
            if "maxLength" in kw:
                self._v_max_length(data, schema)
            if "pattern" in kw:
                self._v_pattern(data, schema)
            if "contentEncoding" in kw:
                data = self._v_content_encoding(data, schema)
            if "contentMediaType" in kw:
                self._v_content_media_type(data, schema)
        elif t in ("integer", "double"):
            if "multipleOf" in kw:
                self._v_multiple_of(data, schema)
            if "minimum" in kw:
                self._v_minimum(data, schema)
            if "exclusiveMinimum" in kw:
                self._v_exclusive_minimum(data, schema)
            if "maximum" in kw:
                self._v_maximum(data, schema)
            if "exclusiveMaximum" in kw:
                self._v_exclusive_maximum(data, schema)
        elif t == "object":
            if "properties" in kw:
                data = self._v_properties(data, schema)
            if isinstance(data, dict):
                if "additionalProperties" in kw:
                    self._v_additional_properties(data, schema)
                if "required" in kw:
                    self._v_required(data, schema)
                if "propertyNames" in kw:
                    self._v_property_names(data, schema)
                if "minProperties" in kw:
                    self._v_min_properties(data, schema)
                if "maxProperties" in kw:
                    self._v_max_properties(data, schema)
                if "dependencies" in kw:
                    self._v_dependencies(data, schema)
                if "patternProperties" in kw:
                    self._v_pattern_properties(data, schema)
                self._remove_additional_properties(data, schema)
        elif t == "array":
            if "items" in kw:
                self._v_items(data, schema)
            if "contains" in kw:
                self._v_contains(data, schema)
            if "additionalItems" in kw:
                self._v_additional_items(data, schema)
            if "minItems" in kw:
                self._v_min_items(data, schema)
            if "maxItems" in kw:
                self._v_max_items(data, schema)
            if kw.get("uniqueItems"):
                self._v_unique_items(data, schema)
            data = self._remove_additional_items(data, schema)

        return data

    # -- defaults -------------------------------------------------------
    def _apply_defaults(self, data: Any, schema: CompiledSchema) -> Any:
        if (self.mode & MODE_APPLY_DEFAULTS) == 0:
            return data
        if schema.is_bool():
            return data
        if schema.has("default"):
            default = schema.get("default")
            if isinstance(default, dict) and isinstance(data, dict):
                for k, v in default.items():
                    data[k] = v
            else:
                return default
        return data

    # -- generic keywords ----------------------------------------------
    def _v_type(self, data: Any, schema: CompiledSchema) -> Any:
        types = schema.get("type") or []
        if not types:
            return data

        if (self.mode & MODE_CAST) and len(types) == 1:
            data = phpsem.CASTS[types[0]](data)

        dt = phpsem.php_type(data).lower()
        if dt == "double":
            if "integer" in types and phpsem.is_integral_number(data):
                dt = "integer"
            else:
                dt = "number"
        elif dt == "integer":
            if "integer" not in types:
                dt = "number"

        if dt not in types:
            raise ValidationError(
                f'schema types "{";".join(types)}" do not match data type '
                f'"{dt}"', schema.path, "type")
        return data

    def _v_format(self, data: Any, schema: CompiledSchema) -> None:
        if not schema.has("format"):
            return
        name = schema.get("format")
        if name not in self.formats:
            raise SchemaError(f"unknown format {name!r}", schema.path)
        if not self.formats[name](data):
            raise ValidationError(
                f"data does not match format {name!r}", schema.path, "format")

    def _v_if_then_else(self, data: Any, schema: CompiledSchema) -> Any:
        if not schema.has("if"):
            return data

        suspended = self._suspend_defaults()
        try:
            try:
                self.validate(data, schema.get("if"))
                if_ok = True
            except ValidationError:
                if_ok = False

            apply_from = None
            if if_ok:
                if schema.has("then"):
                    data = self.validate(data, schema.get("then"))
                    apply_from = schema.get("then")
            else:
                if schema.has("else"):
                    data = self.validate(data, schema.get("else"))
                    apply_from = schema.get("else")
        finally:
            self._restore_defaults(suspended)

        if suspended and apply_from is not None:
            data = self._apply_defaults(data, apply_from)
        return data

    def _v_const(self, data: Any, schema: CompiledSchema) -> None:
        if not schema.has("const"):
            return
        if not phpsem.deep_equal(data, schema.get("const")):
            raise ValidationError("const mismatch", schema.path, "const")

    def _v_enum(self, data: Any, schema: CompiledSchema) -> None:
        if not schema.has("enum"):
            return
        for entry in schema.get("enum"):
            if phpsem.deep_equal(data, entry):
                return
        raise ValidationError("no enum entry matches", schema.path, "enum")

    # -- combinators ----------------------------------------------------
    def _suspend_defaults(self) -> bool:
        on = (self.mode & MODE_APPLY_DEFAULTS) != 0
        if on:
            self.mode &= ~MODE_APPLY_DEFAULTS
        return on

    def _restore_defaults(self, suspended: bool) -> None:
        if suspended:
            self.mode |= MODE_APPLY_DEFAULTS

    def _v_all_of(self, data: Any, schema: CompiledSchema) -> Any:
        if not schema.has("allOf"):
            return data
        subs = schema.get("allOf")
        suspended = self._suspend_defaults()
        ok = 0
        try:
            for sub in subs:
                try:
                    self.validate(data, sub)
                    ok += 1
                except ValidationError:
                    pass
        finally:
            self._restore_defaults(suspended)
        if ok != len(subs):
            raise ValidationError(
                f"allOf expected {len(subs)} matches, got {ok}",
                schema.path, "allOf")
        for sub in subs:
            data = self._apply_defaults(data, sub)
        return data

    def _v_any_of(self, data: Any, schema: CompiledSchema) -> Any:
        if not schema.has("anyOf"):
            return data
        suspended = self._suspend_defaults()
        try:
            for sub in schema.get("anyOf"):
                try:
                    self.validate(data, sub)
                except ValidationError:
                    continue
                self._restore_defaults(suspended)
                return self._apply_defaults(data, sub)
        finally:
            self._restore_defaults(suspended)
        raise ValidationError("no anyOf branch matches", schema.path, "anyOf")

    def _v_one_of(self, data: Any, schema: CompiledSchema) -> Any:
        if not schema.has("oneOf"):
            return data
        suspended = self._suspend_defaults()
        winner = None
        ok = 0
        try:
            for sub in schema.get("oneOf"):
                try:
                    self.validate(data, sub)
                    winner = sub
                    ok += 1
                except ValidationError:
                    continue
        finally:
            self._restore_defaults(suspended)
        if ok != 1:
            raise ValidationError(
                f"oneOf expected exactly 1 match, got {ok}",
                schema.path, "oneOf")
        if suspended and winner is not None:
            data = self._apply_defaults(data, winner)
        return data

    def _v_not(self, data: Any, schema: CompiledSchema) -> None:
        if not schema.has("not"):
            return
        try:
            self.validate(data, schema.get("not"))
        except ValidationError:
            return
        raise ValidationError(
            "data matches the 'not' schema", schema.path, "not")

    # -- string keywords ------------------------------------------------
    def _v_min_length(self, data: str, schema: CompiledSchema) -> None:
        if schema.has("minLength") and len(data) < schema.get("minLength"):
            raise ValidationError(
                f"shorter than minLength {schema.get('minLength')}",
                schema.path, "minLength")

    def _v_max_length(self, data: str, schema: CompiledSchema) -> None:
        if schema.has("maxLength") and len(data) > schema.get("maxLength"):
            raise ValidationError(
                f"longer than maxLength {schema.get('maxLength')}",
                schema.path, "maxLength")

    def _v_pattern(self, data: str, schema: CompiledSchema) -> None:
        if schema.has("pattern") and not _search(schema.get("pattern"), data):
            raise ValidationError(
                f"pattern {schema.get('pattern')!r} does not match",
                schema.path, "pattern")

    def _v_content_encoding(self, data: str, schema: CompiledSchema) -> Any:
        if not schema.has("contentEncoding"):
            return data
        if schema.get("contentEncoding") == "base64":
            try:
                decoded = base64.b64decode(data, validate=True)
            except (ValueError, TypeError):
                raise ValidationError(
                    "data is not valid base64", schema.path,
                    "contentEncoding") from None
            # the decoded value replaces the data (Validator.php:675)
            return decoded.decode("utf-8", errors="surrogateescape")
        return data

    def _v_content_media_type(self, data: str,
                              schema: CompiledSchema) -> None:
        if not schema.has("contentMediaType"):
            return
        if schema.get("contentMediaType") == "application/json":
            try:
                json.loads(data)
            except ValueError:
                raise ValidationError(
                    "data is not valid JSON", schema.path,
                    "contentMediaType") from None

    # -- numeric keywords -----------------------------------------------
    def _v_multiple_of(self, data: Any, schema: CompiledSchema) -> None:
        if not schema.has("multipleOf"):
            return
        if not phpsem.multiple_of_ok(data, schema.get("multipleOf")):
            raise ValidationError(
                f"not a multiple of {schema.get('multipleOf')}",
                schema.path, "multipleOf")

    def _v_minimum(self, data: Any, schema: CompiledSchema) -> None:
        if schema.has("minimum") and data < schema.get("minimum"):
            raise ValidationError(
                f"below minimum {schema.get('minimum')}",
                schema.path, "minimum")

    def _v_maximum(self, data: Any, schema: CompiledSchema) -> None:
        if schema.has("maximum") and data > schema.get("maximum"):
            raise ValidationError(
                f"above maximum {schema.get('maximum')}",
                schema.path, "maximum")

    def _v_exclusive_minimum(self, data: Any,
                             schema: CompiledSchema) -> None:
        if not schema.has("exclusiveMinimum"):
            return
        if schema.version == "4":
            if schema.get("exclusiveMinimum") is True \
                    and schema.has("minimum") \
                    and data <= schema.get("minimum"):
                raise ValidationError(
                    "at or below exclusive minimum", schema.path,
                    "exclusiveMinimum")
        elif data <= schema.get("exclusiveMinimum"):
            raise ValidationError(
                f"at or below exclusiveMinimum "
                f"{schema.get('exclusiveMinimum')}",
                schema.path, "exclusiveMinimum")

    def _v_exclusive_maximum(self, data: Any,
                             schema: CompiledSchema) -> None:
        if not schema.has("exclusiveMaximum"):
            return
        if schema.version == "4":
            if schema.get("exclusiveMaximum") is True \
                    and schema.has("maximum") \
                    and data >= schema.get("maximum"):
                raise ValidationError(
                    "at or above exclusive maximum", schema.path,
                    "exclusiveMaximum")
        elif data >= schema.get("exclusiveMaximum"):
            raise ValidationError(
                f"at or above exclusiveMaximum "
                f"{schema.get('exclusiveMaximum')}",
                schema.path, "exclusiveMaximum")

    # -- object keywords ------------------------------------------------
    def _v_properties(self, data: dict, schema: CompiledSchema) -> Any:
        if not schema.has("properties"):
            return data
        props: dict[str, CompiledSchema] = schema.get("properties")

        # inject property-level defaults for missing keys; defaulted keys
        # skip validation entirely (Validator.php:917-947)
        defaulted: set[str] = set()
        if self.mode & MODE_APPLY_DEFAULTS:
            for key, sub in props.items():
                if sub.is_bool() or not sub.has("default"):
                    continue
                if key in data:
                    continue
                defaulted.add(key)
                data[key] = sub.get("default")

        ap = schema.get("additionalProperties")
        ap_raw = ap.raw if ap is not None else True
        patterns = list(schema.get("patternProperties", {}).keys())

        for key in list(data.keys()):
            if key in defaulted:
                continue
            if key in props:
                data[key] = self.validate(data[key], props[key])
            elif ap_raw is False:
                if any(_search(p, key) for p in patterns):
                    continue
                raise ValidationError(
                    f"property {key!r} is not declared and additional "
                    "properties are disallowed", schema.path, "properties")
        return data

    def _v_additional_properties(self, data: dict,
                                 schema: CompiledSchema) -> None:
        if not schema.has("additionalProperties"):
            return
        ap: CompiledSchema = schema.get("additionalProperties")
        declared = set(schema.get("properties", {}).keys())
        patterns = list(schema.get("patternProperties", {}).keys())
        for key in list(data.keys()):
            if key in declared:
                continue
            if any(_search(p, key) for p in patterns):
                continue
            data[key] = self.validate(data[key], ap)

    def _v_required(self, data: dict, schema: CompiledSchema) -> None:
        for key in schema.get("required", []):
            if key not in data:
                raise ValidationError(
                    f"missing required property {key!r}",
                    schema.path, "required")

    def _v_property_names(self, data: dict,
                          schema: CompiledSchema) -> None:
        if not schema.has("propertyNames"):
            return
        sub = schema.get("propertyNames")
        for key in data:
            self.validate(key, sub)

    def _v_min_properties(self, data: dict,
                          schema: CompiledSchema) -> None:
        if schema.has("minProperties") \
                and len(data) < schema.get("minProperties"):
            raise ValidationError(
                f"fewer than minProperties {schema.get('minProperties')}",
                schema.path, "minProperties")

    def _v_max_properties(self, data: dict,
                          schema: CompiledSchema) -> None:
        if schema.has("maxProperties") \
                and len(data) > schema.get("maxProperties"):
            raise ValidationError(
                f"more than maxProperties {schema.get('maxProperties')}",
                schema.path, "maxProperties")

    def _v_dependencies(self, data: dict, schema: CompiledSchema) -> None:
        deps = schema.get("dependencies")
        if not deps:
            return
        for key in list(data.keys()):
            if key in deps:
                self.validate(data, deps[key])

    def _v_pattern_properties(self, data: dict,
                              schema: CompiledSchema) -> None:
        pp = schema.get("patternProperties")
        if not pp:
            return
        declared = set(schema.get("properties", {}).keys())
        for pattern, sub in pp.items():
            for key in list(data.keys()):
                if key in declared:
                    continue
                if _search(pattern, key):
                    data[key] = self.validate(data[key], sub)

    def _remove_additional_properties(self, data: dict,
                                      schema: CompiledSchema) -> None:
        # only when additionalProperties is absent (Validator.php:1193-1195)
        if schema.has("additionalProperties"):
            return
        if (self.mode & MODE_REMOVE_ADDITIONALS) == 0:
            return
        allowed = set(schema.get("properties", {}).keys())
        for key in list(data.keys()):
            if key not in allowed:
                del data[key]

    # -- array keywords -------------------------------------------------
    def _v_items(self, data: list, schema: CompiledSchema) -> None:
        if not schema.has("items"):
            return
        items = schema.get("items")
        ai = schema.get("additionalItems")
        ai_raw = ai.raw if ai is not None else True

        if isinstance(items, list):  # tuple form
            for i, item in enumerate(data):
                if i < len(items):
                    data[i] = self.validate(item, items[i])
                elif ai_raw is False:
                    raise ValidationError(
                        f"array item {i} exceeds the tuple item list",
                        schema.path, "items")
        else:
            for i, item in enumerate(data):
                data[i] = self.validate(item, items)

    def _v_contains(self, data: list, schema: CompiledSchema) -> None:
        if not schema.has("contains"):
            return
        sub = schema.get("contains")
        for i, item in enumerate(data):
            try:
                data[i] = self.validate(item, sub)
                return
            except ValidationError:
                continue
        raise ValidationError(
            "no array item matches 'contains'", schema.path, "contains")

    def _v_additional_items(self, data: list,
                            schema: CompiledSchema) -> None:
        if not schema.has("additionalItems"):
            return
        items = schema.get("items")
        # single `items: true` schema short-circuits the check
        if isinstance(items, CompiledSchema) and items.raw is True:
            return
        start = len(items) if isinstance(items, list) else 0
        sub = schema.get("additionalItems")
        for i in range(start, len(data)):
            data[i] = self.validate(data[i], sub)

    def _v_min_items(self, data: list, schema: CompiledSchema) -> None:
        if schema.has("minItems") and len(data) < schema.get("minItems"):
            raise ValidationError(
                f"fewer than minItems {schema.get('minItems')}",
                schema.path, "minItems")

    def _v_max_items(self, data: list, schema: CompiledSchema) -> None:
        if schema.has("maxItems") and len(data) > schema.get("maxItems"):
            raise ValidationError(
                f"more than maxItems {schema.get('maxItems')}",
                schema.path, "maxItems")

    def _v_unique_items(self, data: list, schema: CompiledSchema) -> None:
        if not schema.get("uniqueItems", False):
            return
        seen = {phpsem.unique_key(v) for v in data}
        if len(seen) != len(data):
            raise ValidationError(
                "array items are not unique", schema.path, "uniqueItems")

    def _remove_additional_items(self, data: list,
                                 schema: CompiledSchema) -> list:
        # only when additionalItems is absent (Validator.php:1420-1422)
        if schema.has("additionalItems"):
            return data
        if (self.mode & MODE_REMOVE_ADDITIONALS) == 0:
            return data
        items = schema.get("items")
        if isinstance(items, list):
            allowed = len(items)
        elif isinstance(items, CompiledSchema):
            allowed = 1  # PHP count() over a single object is 1
        else:
            allowed = 0
        return data[:allowed]
