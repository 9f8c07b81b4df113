"""Port of the reference's golden-fixture protocol to the Python/Spark
engine.

Mirrors /root/reference/tests/run.php: every fixture file under
tests/draft{4,6,7}/ holds groups of {description, schema, tests|valid};
each group yields one SCHEMA case (does the schema compile? run.php:89-112)
and one DATA case per test (does the data validate / rewrite as expected?
run.php:117-171). The ignore list re-expresses run.php:271-288 keyed on
(file, group description, test description) instead of error-message
regexes.
"""

from __future__ import annotations

import copy
import json
import os
import pickle
import re
from dataclasses import dataclass
from typing import Any

from json_schema_spark.errors import SchemaError, ValidationError
from json_schema_spark.validator import phpsem
from json_schema_spark.validator.document import (
    MODE_APPLY_DEFAULTS,
    MODE_CAST,
    MODE_REMOVE_ADDITIONALS,
    CompiledSchema,
    DocumentValidator,
)
from json_schema_spark.validator.refs import resolve_refs

REFERENCE_TESTS = os.environ.get("REFERENCE_TESTS",
                                 "/root/reference/tests")

# (file-basename regex, group-description regex, test-description regex) —
# mirrors run.php:271-288; None matches everything. ref.json,
# refRemote.json, and definitions.json — all wholesale-ignored by the
# reference's CI — run here in full: local pointers/anchors resolve
# natively, and every remote document comes from a pre-seeded cache
# (the meta-schemas the reference itself ships in schema-only/, plus
# the reconstructed public test-suite remotes) with zero network.
IGNORES: list[tuple[str, str | None, str | None]] = [
    # openapi-petstore.json — the reference ignores it as "not ready"
    # (run.php:284); with base-URI $ref resolution it passes here, a
    # capability beyond the reference — no longer ignored.
    # The harness always ORs in MODE_APPLY_DEFAULTS (run.php:124), which
    # injects the draft-4 meta-schema's `exclusiveMaximum: false` /
    # `exclusiveMinimum: false` property defaults into the data — and
    # the meta's own dependencies then demand maximum/minimum. The PHP
    # reference injects identically (Validator.php:919-938) and checks
    # dependencies afterwards (V:1132), so it would fail these two
    # draft-4 cases the same way: parity, not an engine gap. The
    # official suite assumes modeless validation; draft-6/7 metas have
    # no such dependency and their cases run un-ignored.
    (r"draft4/official/ref\.json$",
     r"^remote ref, containing refs itself$", r"^remote ref valid$"),
    (r"draft4/official/definitions\.json$",
     r"^valid definition$", r"^valid definition schema$"),
    (r"^bignum\.json$", r"^integer$", r"^a bignum is an integer$"),
    (r"^bignum\.json$", r"^integer$",
     r"^a negative bignum is an integer$"),
    (r"^zeroTerminatedFloats\.json$",
     r"do not distinguish between different types",
     r"^a float is not an integer even without fractional part$"),
    (r"^properties\.json$",
     r"patternProperties, additionalProperties interaction",
     r"^patternProperty invalidates property$"),
]


# draft-4 spells the anchor keyword `id`; 6/7 use `$id`
_ID_KEYS = {"4": ("$id", "id")}

# meta-schema documents the reference ships locally, keyed by the URL
# their $ref sites use (fragment-stripped, as the resolver's cache
# lookup does) — lets the "remote ref" groups run with zero network
_META_SOURCES = {
    "http://json-schema.org/draft-07/schema":
        ("draft7", "schema-only", "draft7.json"),
    "http://json-schema.org/draft-06/schema":
        ("draft6", "schema-only", "draft6.json"),
    "http://json-schema.org/draft-04/schema":
        ("draft4", "schema-only", "draft6.json"),  # sic: draft-4 meta
}
_meta_cache: dict[str, Any] | None = None

# The refRemote.json fixtures reference documents served from
# localhost:1234 in the upstream JSON-Schema-Test-Suite's remotes/
# directory — the reference repo does not ship them, but they are tiny,
# public, and stable; reconstructed here so the corpus runs with zero
# network. (The reference's own CI ignores the whole file.)
_TEST_SUITE_REMOTES: dict[str, Any] = {
    "http://localhost:1234/integer.json": {"type": "integer"},
    "http://localhost:1234/subSchemas.json": {
        "integer": {"type": "integer"},
        "refToInteger": {"$ref": "#/integer"},
    },
    "http://localhost:1234/folder/folderInteger.json": {"type": "integer"},
    "http://localhost:1234/name.json": {
        "definitions": {
            "orNull": {"anyOf": [{"type": "null"}, {"$ref": "#"}]}},
        "type": "string",
    },
}


def meta_schema_cache(root: str = REFERENCE_TESTS) -> dict[str, Any]:
    global _meta_cache
    if _meta_cache is None:
        _meta_cache = {}
        for url, parts in _META_SOURCES.items():
            path = os.path.join(root, *parts)
            with open(path) as fh:
                _meta_cache[url] = json.load(fh)[0]["schema"]
        _meta_cache.update(_TEST_SUITE_REMOTES)
    return _meta_cache


def _resolve(schema: Any, version: str) -> Any:
    # the harness owns a fresh copy already: skip the defensive copy
    return resolve_refs(schema, copy_input=False,
                        url_cache=meta_schema_cache(),
                        id_keys=_ID_KEYS.get(version, ("$id",)))


def is_ignored(fname: str, group_desc: str, test_desc: str | None) -> bool:
    base = os.path.basename(fname)
    for frx, grx, trx in IGNORES:
        # basename for the classic entries, full path for draft-scoped
        if not (re.search(frx, base) or re.search(frx, fname)):
            continue
        if grx is not None and not re.search(grx, group_desc):
            continue
        if trx is not None and (test_desc is None
                                or not re.search(trx, test_desc)):
            continue
        return True
    return False


@dataclass
class CaseResult:
    file: str
    group: str
    test: str | None
    expected: bool
    got: bool
    error: str | None = None

    @property
    def ok(self) -> bool:
        return self.expected == self.got


def php_loose_equal(a: Any, b: Any) -> bool:
    """PHP == over JSON values (the 'expect' comparison for containers,
    run.php:158-162)."""
    if isinstance(a, dict) and isinstance(b, dict):
        if set(a.keys()) != set(b.keys()):
            return False
        return all(php_loose_equal(v, b[k]) for k, v in a.items())
    if isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            return False
        return all(php_loose_equal(x, y) for x, y in zip(a, b))
    num_a = isinstance(a, (int, float))  # includes bool, as PHP loose ==
    num_b = isinstance(b, (int, float))
    if num_a and num_b:
        return float(a) == float(b)
    return a == b


def php_strict_equal(a: Any, b: Any) -> bool:
    """PHP === for scalars: types must match exactly (1 !== 1.0)."""
    return phpsem.php_type(a) == phpsem.php_type(b) and a == b


def collect_files(root: str = REFERENCE_TESTS) -> list[tuple[str, str]]:
    """[(path, version)] over draft7/draft6/draft4 trees (run.php:266-268)."""
    out = []
    for draft, version in (("draft7", "7"), ("draft6", "6"),
                           ("draft4", "4")):
        base = os.path.join(root, draft)
        for dirpath, _dirs, files in os.walk(base):
            for f in sorted(files):
                if f.endswith(".json"):
                    out.append((os.path.join(dirpath, f), version))
    return out


def run_file(path: str, version: str,
             pickle_roundtrip: bool = False) -> list[CaseResult]:
    """Execute every schema + data case in one fixture file, skipping
    ignore-listed cases."""
    with open(path) as fh:
        groups = json.load(fh)
    results: list[CaseResult] = []

    for group in groups:
        desc = group.get("description", "?")

        # ---- schema case (run.php:89-112) ----
        if not is_ignored(path, desc, None) or "tests" in group:
            expected = True if "tests" in group else group["valid"]
            if not is_ignored(path, desc, None):
                got, err = _schema_case(group["schema"], version)
                results.append(CaseResult(path, desc, None, expected, got,
                                          err))

        # ---- data cases (run.php:117-171) ----
        for test in group.get("tests", []) or []:
            tdesc = test.get("description", "?")
            if is_ignored(path, desc, tdesc):
                continue
            got, err = _data_case(group["schema"], version, test,
                                  pickle_roundtrip)
            results.append(CaseResult(path, desc, tdesc, test["valid"],
                                      got, err))
    return results


def _schema_case(schema_raw: Any, version: str) -> tuple[bool, str | None]:
    try:
        schema = copy.deepcopy(schema_raw)
        if isinstance(schema, (dict, list)):
            schema = _resolve(schema, version)
        compiled = CompiledSchema(schema, version)
        DocumentValidator(0).validate("", compiled)
        return True, None
    except ValidationError as e:
        return True, str(e)  # data failure still means the schema is valid
    except SchemaError as e:
        return False, str(e)


def _data_case(schema_raw: Any, version: str, test: dict,
               pickle_roundtrip: bool) -> tuple[bool, str | None]:
    mode = MODE_APPLY_DEFAULTS
    modes = test.get("modes") or []
    if "CAST" in modes:
        mode |= MODE_CAST
    if "REMOVE_ADDITIONALS" in modes:
        mode |= MODE_REMOVE_ADDITIONALS

    try:
        schema = copy.deepcopy(schema_raw)
        if isinstance(schema, (dict, list)):
            schema = _resolve(schema, version)
        compiled = CompiledSchema(schema, version)
        if pickle_roundtrip:
            # analog of run.php:145's serialize/unserialize round-trip —
            # also proves the compiled schema ships to executors
            compiled = pickle.loads(pickle.dumps(compiled))
        data = copy.deepcopy(test.get("data"))
        new_data = DocumentValidator(mode).validate(data, compiled)
        ok = True
    except ValidationError as e:
        return False, str(e)
    except SchemaError as e:
        return False, f"SCHEMA: {e}"

    if "expect" in test:
        expect = test["expect"]
        containers = (isinstance(new_data, (dict, list))
                      and isinstance(expect, (dict, list)))
        if containers:
            if not php_loose_equal(new_data, expect):
                ok = False
        elif not php_strict_equal(new_data, expect):
            ok = False
    return ok, None


def run_all(root: str = REFERENCE_TESTS,
            pickle_roundtrip: bool = False) -> list[CaseResult]:
    out: list[CaseResult] = []
    for path, version in collect_files(root):
        out.extend(run_file(path, version, pickle_roundtrip))
    return out
