"""Row-level JSON-document validator (the vectorized slow path).

For arbitrary nested JSON columns the columnar compiler can't type
statically, the engine ships a from-scratch pure-Python draft-4/6/7
validator with the reference's exact semantics (three equality relations,
cast/default/remove modes, format registry), exposed as an Arrow-batched
pandas UDF — one Python call per record batch, never per row.

Submodules are imported lazily (``from json_schema_spark.validator import
pyvalidator``) so that the format-check helpers stay importable on bare
executors.
"""
