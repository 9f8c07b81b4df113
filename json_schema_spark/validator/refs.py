"""Driver-side $ref / definitions resolution (pre-compile pass).

The analog of the reference's Ref pre-pass (/root/reference/src/Ref.php):
local JSON-pointer references (#/definitions/..., #/properties/x, ...) are
replaced by the referenced node itself — shared object identity, so
ref-to-ref chains and cycles become shared/self-referential Python
structures. The schema compiler's path-depth guard (document._MAX_PATH_DEPTH,
mirroring Schema.php:186-190) cuts cyclic compilation off to `true`.

Runs entirely on the driver before compilation; executors only ever see the
compiled schema. Remote (http://) refs are intentionally NOT fetched here —
data-plane code must never do network I/O; unresolvable refs are left in
place and compile as inert keywords.
"""

from __future__ import annotations

from typing import Any


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


def resolve_refs(root: Any) -> Any:
    """Replace every local {'$ref': '#/...'} node with the referenced node
    (shared identity). Unresolvable or non-local refs are left untouched."""
    resolving: set[int] = set()

    def walk(node: Any) -> Any:
        if isinstance(node, dict):
            ref = node.get("$ref")
            if isinstance(ref, str) and ref.startswith("#") \
                    and id(node) not in resolving:
                try:
                    target = _lookup(root, ref)
                except (KeyError, IndexError, ValueError):
                    return node
                resolving.add(id(node))
                try:
                    return walk(target)
                finally:
                    resolving.discard(id(node))
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
