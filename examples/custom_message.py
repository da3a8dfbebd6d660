"""Port of the reference's examples/customMessage.js: overriding a
rule's message template."""
import joi_spark as joi
from joi_spark.session import get_spark

spark = get_spark("local[4]")
df = spark.createDataFrame([(1, "ab")], "id bigint, username string")

schema = joi.object({
    "username": joi.string().min(4).message(
        '"username" is too short — at least 4 characters'),
})
joi.validate(df, schema, order_by=["id"]).violations().show(truncate=False)
spark.stop()
