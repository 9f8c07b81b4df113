from json_schema_spark.checks.uniqueness import (
    duplicate_keys,
    uniqueness_violations,
)
from json_schema_spark.checks.referential import referential_violations
from json_schema_spark.checks.stats import column_profile, length_histogram
from json_schema_spark.checks.drift import drift_report

__all__ = [
    "duplicate_keys",
    "uniqueness_violations",
    "referential_violations",
    "column_profile",
    "length_histogram",
    "drift_report",
]
