"""Pure-Python format checks with reference-parity semantics.

From-scratch re-implementations of the 17 built-in format validators
(/root/reference/src/Check.php:88-483). Each mirrors observable behavior —
regex shape, PHP filter_var/parse_url/idn_to_ascii quirks — not the code.
Used by (a) the row-level document validator and (b) the pandas-UDF
fallbacks of the columnar format registry, so both paths verdict
identically.
"""

from __future__ import annotations

import ipaddress
import re
from urllib.parse import urlsplit

# RFC3339 date-time, leap-second-excluded (Check.php:95)
_RX_DATE_TIME = re.compile(
    r"^([0-9]+)-(0[1-9]|1[012])-(0[1-9]|[12][0-9]|3[01])"
    r"[Tt]([01][0-9]|2[0-3]):([0-5][0-9]):([0-5][0-9])(\.[0-9]+)?"
    r"(([Zz])|([+\-]([01][0-9]|2[0-3]):[0-5][0-9]))$")
_RX_TIME = re.compile(
    r"^([01][0-9]|2[0-3]):([0-5][0-9]):([0-5][0-9])(\.[0-9]+)?"
    r"(([Zz])|([+\-]([01][0-9]|2[0-3]):[0-5][0-9]))$")
_RX_DATE = re.compile(
    r"^([0-9]+)-(0[1-9]|1[012])-(0[1-9]|[12][0-9]|3[01])$")
# hostname labels: 1-63 chars, alnum at the edges. Written in linear form
# (bounded inner quantifier, no nested alternation) — the naive
# label-alternation form backtracks catastrophically on non-matching
# hyphenated input, and the 63-char bound is what the official fixture's
# "component too long" case expects.
_RX_HOSTNAME = re.compile(
    r"^(?:[a-z0-9](?:[a-z0-9\-]{0,61}[a-z0-9])?\.)*"
    r"[a-z0-9](?:[a-z0-9\-]{0,61}[a-z0-9])?$", re.IGNORECASE)
_RX_PATH = re.compile(
    r"^(?:(%[0-9a-f]{2})|[a-z0-9/:@\-._~!$&'()*+,;=])*$", re.IGNORECASE)
_RX_JSON_POINTER = re.compile(r"^(?:/[^/#]*)*$")
_RX_TILDE_BAD = re.compile(r"~([^01]|$)")
_RX_REL_JSON_POINTER = re.compile(r"^(0|[1-9][0-9]*)((?:/[^/#]+)*)(#?)$")

# PHP FILTER_VALIDATE_EMAIL approximation: local@domain with dot-atom local
# part (quoted-string accepted), domain of hostname labels with ≥2 labels.
_RX_EMAIL_LOCAL = re.compile(
    r"^[A-Za-z0-9.!#$%&'*+/=?^_`{|}~\-]+$")
_RX_EMAIL_DOMAIN = re.compile(
    r"^(([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]*[a-zA-Z0-9])\.)+"
    r"([A-Za-z0-9]|[A-Za-z0-9][A-Za-z0-9\-]*[A-Za-z0-9])$")


def check_date_time(v) -> bool:
    return isinstance(v, str) and bool(_RX_DATE_TIME.match(v))


def check_time(v) -> bool:
    return isinstance(v, str) and bool(_RX_TIME.match(v))


def check_date(v) -> bool:
    return isinstance(v, str) and bool(_RX_DATE.match(v))


def check_email(v) -> bool:
    if not isinstance(v, str) or "@" not in v:
        return False
    local, _, domain = v.rpartition("@")
    if not local or local.startswith(".") or local.endswith(".") or ".." in local:
        return False
    if not _RX_EMAIL_LOCAL.match(local):
        # PHP accepts quoted local parts like "joe bloggs"@example.com
        if not (local.startswith('"') and local.endswith('"') and len(local) > 1):
            return False
    return bool(_RX_EMAIL_DOMAIN.match(domain))


def _idn_to_ascii(s: str) -> str | None:
    """UTS46 ToASCII — mirrors PHP idn_to_ascii(..., INTL_IDNA_VARIANT_UTS46).
    Python's str.encode('idna') is IDNA2003; close enough for the fixture
    surface; returns None on failure (PHP returns false)."""
    if "〮" in s:
        # HANGUL SINGLE DOT TONE MARK is IDNA-disallowed; UTS46 ToASCII
        # fails on it (and PHP idn_to_ascii returns false)
        return None
    try:
        return s.encode("idna").decode("ascii")
    except (UnicodeError, UnicodeDecodeError):
        # fall back to per-label punycode for inputs idna codec rejects
        try:
            labels = s.split(".")
            out = []
            for lab in labels:
                if lab.isascii():
                    out.append(lab)
                else:
                    out.append("xn--" + lab.encode("punycode").decode("ascii"))
            return ".".join(out)
        except UnicodeError:
            return None


def check_idn_email(v) -> bool:
    if not isinstance(v, str):
        return False
    frags = v.split("@")
    enc = []
    for f in frags:
        e = _idn_to_ascii(f) if not f.isascii() else f
        if e is None:
            return False
        enc.append(e)
    return check_email("@".join(enc))


def _is_ipv6(s: str) -> bool:
    try:
        ipaddress.IPv6Address(s)
        return True
    except ValueError:
        return False


def check_hostname(v) -> bool:
    if not isinstance(v, str):
        return False
    if _RX_HOSTNAME.match(v):
        return True
    m = re.match(r"^\[([^\]]+)\]$", v)
    return _is_ipv6(m.group(1) if m else v)


def check_idn_hostname(v) -> bool:
    if not isinstance(v, str):
        return False
    # Hangul single dot allowed only at position 0 (Check.php:199-203)
    pos = v.find("〮")
    if pos > 0:
        return False
    enc = _idn_to_ascii(v)
    if enc is None:
        return False
    return check_hostname(enc)


def check_ipv4(v) -> bool:
    # PHP FILTER_VALIDATE_IP (no flag) accepts v4 dotted-quad or v6
    if not isinstance(v, str):
        return False
    try:
        ipaddress.IPv4Address(v)
        return True
    except ValueError:
        return _is_ipv6(v)


def check_ipv6(v) -> bool:
    return isinstance(v, str) and _is_ipv6(v)


def _parse_url(v: str):
    """PHP parse_url-compatible split: returns dict of present components
    or None for URLs PHP rejects (notably authorities with stray colons —
    Python's urlsplit().hostname silently truncates those instead)."""
    try:
        parts = urlsplit(v)
    except ValueError:
        return None
    out = {}
    if parts.scheme:
        out["scheme"] = parts.scheme
    netloc = parts.netloc
    if netloc:
        hostport = netloc
        if "@" in netloc:
            userinfo, hostport = netloc.rsplit("@", 1)
            # PHP splits user:pass at the first colon; only user survives
            # Helper::buildUrl
            out["user"] = userinfo.split(":", 1)[0]
        if hostport.startswith("["):
            m = re.match(r"^(\[[^\]]*\])(?::([0-9]*))?$", hostport)
            if not m:
                return None
            out["host"] = m.group(1)  # brackets kept, as PHP does
            if m.group(2):
                out["port"] = int(m.group(2))
        else:
            n_colons = hostport.count(":")
            if n_colons == 0:
                host, port = hostport, ""
            elif n_colons == 1:
                host, port = hostport.split(":")
                if port and not port.isdigit():
                    return None
            else:
                return None  # PHP parse_url fails on multi-colon authority
            if host:
                out["host"] = host
            if port:
                out["port"] = int(port)
    # PHP keeps the raw path (no normalization)
    if parts.path:
        out["path"] = parts.path
    if parts.query:
        out["query"] = parts.query
    if parts.fragment:
        out["fragment"] = parts.fragment
    return out


def _path_ok(s: str) -> bool:
    return bool(_RX_PATH.match(s))


def check_uri(v) -> bool:
    # scheme required; host/path/fragment validity (Check.php:243-272)
    if not isinstance(v, str):
        return False
    u = _parse_url(v)
    if u is None:
        return False
    if not u.get("scheme"):
        return False
    if "host" in u and not check_hostname(u["host"]):
        return False
    if "path" in u and not _path_ok(u["path"]):
        return False
    if "fragment" in u and not _path_ok(u["fragment"]):
        return False
    return True


def check_uri_reference(v) -> bool:
    if not isinstance(v, str):
        return False
    u = _parse_url(v)
    if u is None:
        return False
    if "host" in u and not check_hostname(u["host"]):
        return False
    if "path" in u and not _path_ok(u["path"]):
        return False
    if "fragment" in u and not _path_ok(u["fragment"]):
        return False
    return True


def _rebuild_url(u: dict) -> str:
    """Mirror Helper::buildUrl (/root/reference/src/Helper.php:13-57)."""
    uri = u.get("path", "/")
    if "query" in u:
        uri += "?" + u["query"]
    if "fragment" in u:
        uri += "#" + u["fragment"]
    if "host" in u:
        authority = u["host"]
        if "port" in u:
            authority += ":" + str(u["port"])
        if "user" in u:
            authority = u["user"] + "@" + authority
        if uri and uri[0] not in "/?#":
            uri = "/" + uri
        uri = "//" + authority + uri
    if "scheme" in u:
        if u["scheme"] == "file":
            uri = "//" + uri
        return u["scheme"] + ":" + uri
    return uri


def _idn_components(v: str) -> str | None:
    u = _parse_url(v)
    if u is None:
        return None
    for comp in ("host", "path", "fragment"):
        if comp in u:
            val = u[comp]
            if not val.isascii():
                enc = _idn_to_ascii(val)
                if enc is None:
                    return None
                u[comp] = enc
    return _rebuild_url(u)


def check_iri(v) -> bool:
    if not isinstance(v, str):
        return False
    rebuilt = _idn_components(v)
    return rebuilt is not None and check_uri(rebuilt)


def check_iri_reference(v) -> bool:
    if not isinstance(v, str):
        return False
    rebuilt = _idn_components(v)
    return rebuilt is not None and check_uri_reference(rebuilt)


def check_uri_template(v) -> bool:
    # balanced braces + uri/path check on the de-templated string
    # (Check.php:367-393)
    if not isinstance(v, str):
        return False
    if v.count("{") != v.count("}"):
        return False
    u = _parse_url(v)
    stripped = v
    if u and u.get("path"):
        fixed = u["path"].replace("{", "").replace("}", "")
        stripped = v.replace(u["path"], fixed)
    if u and u.get("scheme"):
        return check_uri(stripped)
    if u and u.get("path"):
        return _path_ok(stripped)
    return False


def check_json_pointer(v) -> bool:
    if not isinstance(v, str):
        return False
    if v != "" and not _RX_JSON_POINTER.match(v):
        return False
    return not _RX_TILDE_BAD.search(v)


def check_relative_json_pointer(v) -> bool:
    if not isinstance(v, str):
        return False
    if not _RX_REL_JSON_POINTER.match(v):
        return False
    return not _RX_TILDE_BAD.search(v)


_RX_UNESCAPED_SLASH = re.compile(r"(?<!\\)(?:\\\\)*/")


def check_regex(v) -> bool:
    # compilable pattern; \A / \Z anchors rejected (Check.php:450-452)
    if not isinstance(v, str):
        return False
    if v.endswith("\\Z") or v.startswith("\\A"):
        return False
    # PHP compiles the pattern as '/'.$p.'/' — an unescaped '/' inside the
    # pattern terminates the delimiter early and the leftover chars are
    # invalid modifiers, so such patterns are invalid regexes to PHP
    if _RX_UNESCAPED_SLASH.search(v):
        return False
    try:
        re.compile(v)
        return True
    except re.error:
        return False


# name (JSON-Schema format id) → function name, consumed by the pandas-UDF
# fallback in constraints/formats.py and the document validator
FORMAT_FUNCS: dict[str, str] = {
    "date-time": "check_date_time",
    "time": "check_time",
    "date": "check_date",
    "email": "check_email",
    "idn-email": "check_idn_email",
    "hostname": "check_hostname",
    "idn-hostname": "check_idn_hostname",
    "ipv4": "check_ipv4",
    "ipv6": "check_ipv6",
    "uri": "check_uri",
    "uri-reference": "check_uri_reference",
    "iri": "check_iri",
    "iri-reference": "check_iri_reference",
    "uri-template": "check_uri_template",
    "json-pointer": "check_json_pointer",
    "relative-json-pointer": "check_relative_json_pointer",
    "regex": "check_regex",
}
