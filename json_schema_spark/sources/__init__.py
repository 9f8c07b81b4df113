from json_schema_spark.sources.webtext import (
    WEBTEXT_SCHEMA,
    generate_webtext,
    write_webtext,
    load_webtext,
)
from json_schema_spark.sources.io import read_table

__all__ = [
    "WEBTEXT_SCHEMA",
    "generate_webtext",
    "write_webtext",
    "load_webtext",
    "read_table",
]
