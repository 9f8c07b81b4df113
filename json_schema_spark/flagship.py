"""The north-star workload: full validation pass over the webtext table.

Bundles the keyword set called out in BASELINE.json north_star — type,
format, enum, minLength/maxLength, pattern, required, uniqueItems — as a
ConstraintSet over (url, warc_ts, html, text, lang), plus the table-level
generalizations (url uniqueness, lang referential check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from json_schema_spark.constraints.evaluator import ValidationResult, validate
from json_schema_spark.constraints.spec import ConstraintSet
from json_schema_spark.sources.webtext import LANG_ALLOWLIST


def webtext_constraints() -> ConstraintSet:
    return ConstraintSet(
        name="webtext_northstar",
        columns={
            "url": {
                "type": "string",
                "required": True,
                "format": "uri",
                "pattern": "^https?://",
            },
            "warc_ts": {"required": True},
            "text": {
                "type": ["string", "null"],
                "minLength": 1,
                "maxLength": 100_000,
                "pattern": r"\S",
            },
            "lang": {"enum": LANG_ALLOWLIST + [None]},
            "html": {"type": ["binary", "null"]},
        },
        unique=["url"],
        referential={"lang": LANG_ALLOWLIST},
    )


def validate_webtext(df: DataFrame) -> ValidationResult:
    return validate(df, webtext_constraints(), id_col="url")
