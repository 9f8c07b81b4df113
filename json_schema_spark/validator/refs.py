"""Driver-side $ref / $id / definitions resolution (pre-compile pass).

The analog of the reference's Ref pre-pass (/root/reference/src/Ref.php):
- `$id` interning (Ref.php:114-145 registerIdentifications): every object
  node carrying a string `$id` is registered under that value and the
  `$id` key removed; a `$ref` whose value EXACTLY matches a registered
  `$id` resolves to that node (checked before URL/pointer dispatch, same
  order as Ref.php:162-171).
- remote refs (Ref.php:295-333 downloadJsonResource): http(s):// and
  file:// refs are fetched ON THE DRIVER with a small timeout and a
  per-resolution URL cache, mirroring CURL_TIMEOUT/urlCache. Executors
  never fetch anything — the data-plane no-I/O invariant holds because
  resolution happens before compilation. (The reference dispatches only
  on the literal prefix 'http://' — Ref.php:174 checks it twice where
  https was clearly intended; we accept https and file too.) Fetching
  is OPT-IN (``fetch_remote=True``): compiling an untrusted schema must
  not be able to read driver-local files (file://) or probe internal
  endpoints (SSRF) by default — a wider surface than the reference's
  'http://'-only dispatch would be.
- local JSON-pointer references (#/definitions/..., #/properties/x, ...)
  are replaced by the referenced node itself — shared object identity,
  so ref-to-ref chains and cycles become shared/self-referential Python
  structures. The schema compiler's path-depth guard
  (document._MAX_PATH_DEPTH, mirroring Schema.php:186-190) cuts cyclic
  compilation off to `true`.
"""

from __future__ import annotations

import copy
import json
from typing import Any

from json_schema_spark.errors import SchemaError

REMOTE_TIMEOUT_SECONDS = 1.0  # Ref.php:11 CURL_TIMEOUT = 1000 ms
_REMOTE_SCHEMES = ("http://", "https://", "file://")


def _unescape(segment: str) -> str:
    # JSON-pointer escapes incl. the two %-escapes the reference handles
    # (Ref.php:260)
    return (segment.replace("~1", "/").replace("~0", "~")
            .replace("%25", "%").replace("%22", '"'))


def _lookup(root: Any, pointer: str) -> Any:
    """Resolve '#/a/b/0' against the root; raises KeyError/IndexError on a
    dangling pointer."""
    if pointer in ("#", "#/", ""):
        return root
    node = root
    for seg in pointer.lstrip("#").strip("/").split("/"):
        seg = _unescape(seg)
        if isinstance(node, list):
            node = node[int(seg)]
        elif isinstance(node, dict):
            node = node[seg]
        else:
            raise KeyError(seg)
    return node


def collect_ids(root: Any) -> dict[str, Any]:
    """Pre-pass: register every object node with a string `$id` under
    that value and REMOVE the `$id` key (Ref.php:122-131 stores the node
    and unsets the property). Cycle-safe."""
    ids: dict[str, Any] = {}
    seen: set[int] = set()

    def walk(node: Any) -> None:
        if id(node) in seen:
            return
        if isinstance(node, dict):
            seen.add(id(node))
            anchor = node.get("$id")
            if isinstance(anchor, str):
                ids[anchor] = node
                del node["$id"]
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            seen.add(id(node))
            for v in node:
                walk(v)

    walk(root)
    return ids


def fetch_remote_schema(url: str, cache: dict[str, Any] | None = None,
                        timeout: float = REMOTE_TIMEOUT_SECONDS) -> Any:
    """Driver-side remote schema fetch with URL cache
    (Ref.php:295-333): one request per distinct URL per resolution,
    SchemaError on transport or JSON errors (RefException analog)."""
    if cache is not None and url in cache:
        return cache[url]
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            data = resp.read()
    except Exception as exc:  # transport error → RefException parity
        raise SchemaError(
            f'external reference download problem: "{exc}" ({url})'
        ) from exc
    try:
        doc = json.loads(data)
    except ValueError as exc:
        raise SchemaError(f'invalid json response for url "{url}"') from exc
    if cache is not None:
        cache[url] = doc
    return doc


def resolve_refs(root: Any, fetch_remote: bool = False,
                 url_cache: dict[str, Any] | None = None,
                 copy_input: bool = True) -> Any:
    """Resolve every `$ref`, dispatching in the reference's order: $id
    anchor match, then remote URL, then local JSON pointer. Resolved
    nodes share object identity, so ref-to-ref chains and cycles become
    shared/self-referential structures. Unresolvable refs are left
    untouched (they compile as inert keywords).

    ``fetch_remote`` is opt-in: by default http(s):// and file:// refs
    stay unresolved, so an untrusted schema cannot read driver-local
    files or reach internal endpoints. ``copy_input`` (default) works on
    a deep copy — resolution strips `$id` keys and rewires nodes, and
    callers should not see their schema dict mutated; pass False only
    on a throwaway tree where the copy is measurable."""
    if copy_input:
        root = copy.deepcopy(root)
    ids = collect_ids(root)
    if url_cache is None:
        url_cache = {}
    resolving: set[int] = set()

    def walk(node: Any) -> Any:
        if isinstance(node, dict):
            ref = node.get("$ref")
            if isinstance(ref, str) and id(node) not in resolving:
                target = None
                if ref in ids:
                    target = ids[ref]
                elif ref.startswith(_REMOTE_SCHEMES):
                    if fetch_remote:
                        target = fetch_remote_schema(ref, url_cache)
                elif ref.startswith("#"):
                    try:
                        target = _lookup(root, ref)
                    except (KeyError, IndexError, ValueError):
                        target = None
                if target is not None:
                    resolving.add(id(node))
                    try:
                        return walk(target)
                    finally:
                        resolving.discard(id(node))
                return node
            if id(node) in resolving:
                return node
            resolving.add(id(node))
            try:
                for k in list(node.keys()):
                    node[k] = walk(node[k])
            finally:
                resolving.discard(id(node))
            return node
        if isinstance(node, list):
            if id(node) in resolving:
                return node
            resolving.add(id(node))
            try:
                for i in range(len(node)):
                    node[i] = walk(node[i])
            finally:
                resolving.discard(id(node))
            return node
        return node

    return walk(root)
