"""Dev smoke: generate webtext, run the flagship validation, print outputs."""
import time

from json_schema_spark.session import get_spark
from json_schema_spark.sources.webtext import generate_webtext
from json_schema_spark.flagship import validate_webtext

spark = get_spark(cores=8)
df = generate_webtext(spark, 6000)
t0 = time.time()
res = validate_webtext(df)
summary = res.constraint_summary().collect()
print("constraint_summary:")
for r in summary:
    print(f"  {r['constraint_id']}: {r['n_violations']}")
print("metrics:", res.metrics())
verdicts = res.partition_verdicts(by="warc_ts").limit(0)  # schema check only
res.partition_verdicts().show(5, False)
print("day verdicts:")
from pyspark.sql import functions as F
res.partition_verdicts(by=F.to_date("warc_ts")).orderBy("partition_key").show(31, False)
print(f"elapsed: {time.time()-t0:.1f}s")
res.annotated.select("url", "_violations", "_ok").filter("!_ok").show(5, False)
