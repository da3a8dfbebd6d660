"""Port of the reference's examples/timestamps.js: unix/javascript
epoch coercion with bounds."""
import joi_spark as joi
from joi_spark.session import get_spark

spark = get_spark("local[4]")
df = spark.createDataFrame(
    [(1, 1700000000), (2, 100)], "id bigint, created bigint")

schema = joi.object({
    "created": joi.date().timestamp("unix").min("2001-01-01 00:00:00"),
})
res = joi.validate(df, schema, order_by=["id"])
res.violations().show(truncate=False)   # id 2: before the epoch bound
res.value.show()                        # created coerced to timestamps
spark.stop()
