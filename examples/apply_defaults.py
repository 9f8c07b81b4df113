"""Spark analog of /root/reference/examples/defaults-example.php
(MODE_APPLY_DEFAULTS): null columns take their schema default in one
projection.

Run: python examples/apply_defaults.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from json_schema_spark import ConstraintSet  # noqa: E402
from json_schema_spark.constraints.evaluator import apply_defaults  # noqa: E402
from json_schema_spark.session import get_spark  # noqa: E402

spark = get_spark(cores=4)
df = spark.createDataFrame([(1, None), (2, "Tuesday")],
                           "id long, day1 string")
cset = ConstraintSet(columns={"day1": {"type": ["string", "null"],
                                       "default": "Monday"}})
apply_defaults(df, cset).show()
spark.stop()
