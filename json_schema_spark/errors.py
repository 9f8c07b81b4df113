"""Engine exceptions.

Mirrors the reference's two-exception model (`SchemaException` for malformed
schemas at compile time — /root/reference/src/Schema.php throughout — and
`ValidationException` at validate time — /root/reference/src/Validator.php).
In the Spark engine ValidationError is only raised by the row-level Python
validator; the columnar path never raises per row — it emits violation rows.
"""

from __future__ import annotations


class SchemaError(ValueError):
    """Malformed schema / constraint spec, detected at compile time."""

    def __init__(self, message: str, path: str = "#"):
        super().__init__(f"{path}: {message}")
        self.path = path
        self.reason = message


class ValidationError(ValueError):
    """A data value failed a constraint (row-level validator only)."""

    def __init__(self, message: str, path: str = "#", keyword: str = ""):
        super().__init__(f"{path}: {message}")
        self.path = path
        self.keyword = keyword
        self.reason = message
