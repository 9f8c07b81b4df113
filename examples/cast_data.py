"""Spark analog of /root/reference/examples/cast-data.php (MODE_CAST):
string->integer/number/boolean and JSON-string->struct casts as a
DataFrame transform (constraints/transforms.cast_columns).

Run: python examples/cast_data.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from json_schema_spark.constraints.transforms import cast_columns  # noqa: E402
from json_schema_spark.session import get_spark  # noqa: E402

spark = get_spark(cores=4)
df = spark.createDataFrame(
    [(123, '{"key": "value"}', "456", "10.10", "TRUE")],
    "stringTest long, jsonStringTest string, integerTest string, "
    "numberTest string, booleanTest string")

casted = cast_columns(df, {
    "stringTest": "string",           # integer -> string
    "jsonStringTest": {"object": "key string"},  # JSON string -> struct
    "integerTest": "integer",         # string -> long
    "numberTest": "number",           # string -> double
    "booleanTest": "boolean",         # 'TRUE' -> true (loose PHP rules)
})
casted.show(truncate=False)
casted.printSchema()
spark.stop()
