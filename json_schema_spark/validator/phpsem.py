"""PHP-observable-semantics helpers for the row-level document validator.

The reference runs on PHP 7.2, and several of its verdicts depend on PHP
value semantics rather than JSON Schema proper: the deep-equality relation
used by const/enum (/root/reference/src/Helper.php:65-137), the
serialize()-based equality used by uniqueItems
(/root/reference/src/Validator.php:1383-1410), the loose casts of
MODE_CAST (/root/reference/src/Cast.php), and the power-of-ten float
rescaling of multipleOf (/root/reference/src/Validator.php:736-747).
This module re-expresses those OBSERVABLE behaviors in plain Python —
the implementations are from scratch.

JSON value model (Python): dict=object, list=array, str, int (bool
excluded), float, bool, None. `php_type` mirrors gettype()'s vocabulary.
"""

from __future__ import annotations

import math
import re
from typing import Any

_INT_STRING_RX = re.compile(r"-?[1-9][0-9]*|0")


def php_type(v: Any) -> str:
    """gettype() vocabulary. bool is checked before int (Python bools are
    ints; PHP booleans are their own type)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "double"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    return "unknown"


def is_integral_number(v: Any) -> bool:
    """The 1.0-is-an-integer rule (Check::integer,
    /root/reference/src/Check.php:33-41)."""
    if isinstance(v, bool):
        return False
    if isinstance(v, float):
        return not math.isinf(v) and not math.isnan(v) and v == int(v)
    return isinstance(v, int)


def php_int_cast(x: float) -> int:
    """(int) cast: truncation toward zero; INF/NAN degrade to 0 (the PHP 7
    behavior the multipleOf trick relies on for 1/0.0 edge inputs)."""
    if math.isinf(x) or math.isnan(x):
        return 0
    return int(x)


# ---------------------------------------------------------------------------
# Deep equality (const / enum) — Helper::compare semantics
# ---------------------------------------------------------------------------

def deep_equal(a: Any, b: Any) -> bool:
    """The reference's const/enum equality: integer and double unify to
    "number" and compare numerically (1 == 1.0); booleans/strings/null
    compare strictly; objects compare by key set then per-key value; arrays
    compare ORDER-INSENSITIVELY at the first level (a reference
    idiosyncrasy: both sides are sorted before pairwise comparison,
    Helper.php:110-116 — re-expressed here as first-level multiset
    matching, which accepts the same pairs for JSON inputs)."""
    ta, tb = php_type(a), php_type(b)
    if ta in ("integer", "double"):
        ta = "number"
    if tb in ("integer", "double"):
        tb = "number"
    if ta != tb:
        return False
    if ta == "number":
        return a == b
    if ta == "object":
        if not _multiset_equal(list(a.keys()), list(b.keys())):
            return False
        # missing key on b reads as null (PHP $b->{$key} on absent property)
        return all(deep_equal(av, b.get(k)) for k, av in a.items())
    if ta == "array":
        if len(a) != len(b):
            return False
        return _multiset_equal(a, b)
    return a == b  # strict === for string/boolean/NULL (types already match)


def _multiset_equal(a: list, b: list) -> bool:
    if len(a) != len(b):
        return False
    used = [False] * len(b)
    for x in a:
        for j, y in enumerate(b):
            if not used[j] and deep_equal(x, y):
                used[j] = True
                break
        else:
            return False
    return True


# ---------------------------------------------------------------------------
# serialize()-equality (uniqueItems) — Validator.php:1383-1410
# ---------------------------------------------------------------------------

def _float_repr(v: float) -> str:
    # PHP's serialize_precision=-1 prints the shortest round-trip form and
    # drops a zero fraction (serialize(1.0) == 'd:1;')
    if not math.isinf(v) and not math.isnan(v) and v == int(v) \
            and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def php_serialize(v: Any) -> str:
    """Shape-compatible rendering of PHP serialize() over JSON-decoded
    values. Only equality of outputs matters (uniqueItems compares
    serializations), so this mirrors PHP's *distinctions*: 0 != false,
    1 != true, 1.0 == 1.00, and container structure/key order."""
    t = php_type(v)
    if t == "NULL":
        return "N;"
    if t == "boolean":
        return "b:1;" if v else "b:0;"
    if t == "integer":
        return f"i:{v};"
    if t == "double":
        return f"d:{_float_repr(v)};"
    if t == "string":
        raw = v.encode("utf-8")
        return f's:{len(raw)}:"{v}";'
    if t == "array":
        inner = "".join(f"i:{i};{php_serialize(x)}" for i, x in enumerate(v))
        return f"a:{len(v)}:{{{inner}}}"
    if t == "object":
        inner = "".join(
            f'{php_serialize(str(k))}{php_serialize(x)}' for k, x in v.items())
        return f'O:8:"stdClass":{len(v)}:{{{inner}}}'
    return repr(v)


def unique_key(v: Any):
    """uniqueItems collects raw ints/strings and serialize() of everything
    else into a PHP array, then counts distinct keys — PHP array keys
    coerce canonical integer-strings to ints ("1" collides with 1), while
    booleans/floats go through serialize() and never collide with ints."""
    if isinstance(v, bool):
        return ("s", php_serialize(v))
    if isinstance(v, int):
        return ("k", v)
    if isinstance(v, str):
        if _INT_STRING_RX.fullmatch(v):
            return ("k", int(v))
        return ("k", v)
    return ("s", php_serialize(v))


# ---------------------------------------------------------------------------
# MODE_CAST conversions — Cast.php
# ---------------------------------------------------------------------------

def _is_numeric_string(s: str) -> bool:
    """PHP is_numeric(): int/float literals incl. exponents and leading
    whitespace, but not hex (PHP 7) and not trailing junk."""
    try:
        ss = s.lstrip(" \t\n\r\v\f")
        if ss.lower().startswith("0x"):
            return False
        float(ss)
        return True
    except (ValueError, TypeError):
        return False


def cast_string(v: Any) -> Any:
    if php_type(v) in ("integer", "double"):
        if isinstance(v, float):
            return _float_repr(v)
        return str(v)
    return v


def cast_number(v: Any) -> Any:
    if not isinstance(v, float) and _php_numeric(v):
        return float(v)
    return v


def cast_integer(v: Any) -> Any:
    if (isinstance(v, bool) or not isinstance(v, int)) and _php_numeric(v):
        if "." in str(_strval(v)):
            return float(v)
        return int(float(v))
    return v


def _php_numeric(v: Any) -> bool:
    if isinstance(v, bool):
        return False
    if isinstance(v, (int, float)):
        return True
    if isinstance(v, str):
        return _is_numeric_string(v)
    return False


def _strval(v: Any) -> str:
    if isinstance(v, float):
        return _float_repr(v)
    return str(v)


def cast_object(v: Any) -> Any:
    if isinstance(v, str):
        import json
        try:
            new = json.loads(v)
        except ValueError:
            return v
        if isinstance(new, dict) or new is None:
            return new
    return v


def cast_array(v: Any) -> Any:
    if isinstance(v, str):
        import json
        try:
            new = json.loads(v)
        except ValueError:
            return v
        if isinstance(new, list) or new is None:
            return new
    return v


def cast_boolean(v: Any) -> Any:
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        if v == 1:
            return True
        if v == 0:
            return False
    elif isinstance(v, str):
        if v == "1" or v.lower() == "true":
            return True
        if v == "0" or v.lower() == "false":
            return False
    return v


def cast_null(v: Any) -> Any:
    # PHP loose ($data == 'null') per the PHP 7 comparison table
    # (Cast.php:136-143): exact string 'null'; numerics loosely equal 0
    # (non-numeric string coerces to 0); true (string coerces to bool
    # true). '' and false do NOT match.
    if isinstance(v, str):
        return None if v == "null" else v
    if isinstance(v, bool):
        return None if v else v
    if isinstance(v, (int, float)) and v == 0:
        return None
    return v


CASTS = {
    "string": cast_string,
    "number": cast_number,
    "integer": cast_integer,
    "object": cast_object,
    "array": cast_array,
    "boolean": cast_boolean,
    "null": cast_null,
}


# ---------------------------------------------------------------------------
# multipleOf float rescaling — Validator.php:736-747
# ---------------------------------------------------------------------------

def multiple_of_ok(number: Any, multiple_of: Any) -> bool:
    if isinstance(number, int) and not isinstance(number, bool) \
            and number == 0:
        return True  # strict ===0: int zero always passes (V:731-733)
    n, m = number, multiple_of
    if isinstance(n, float) or isinstance(m, float):
        # scale both by the larger power of ten implied by 1/x's integer
        # digit count — the reference's trick to sidestep float remainders
        zero_multiplier = 1
        for x in (n, m):
            try:
                inv = 1 / x
            except ZeroDivisionError:
                inv = math.inf
            length = len(str(php_int_cast(inv)))
            tmp = int("1" + "0" * length)
            zero_multiplier = max(zero_multiplier, tmp)
        n = n * zero_multiplier
        m = m * zero_multiplier
    try:
        q = php_int_cast(n / m)
    except ZeroDivisionError:
        return False
    return (n - m * q) == 0
