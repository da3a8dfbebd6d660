"""Port of the reference's examples/conditionalRequire.js: a field
required only when a sibling takes a given value."""
import joi_spark as joi
from joi_spark.session import get_spark

spark = get_spark("local[4]")
df = spark.createDataFrame(
    [(1, "delivery", "12 Main St"), (2, "pickup", None),
     (3, "delivery", None)],
    "order_id bigint, method string, address string")

schema = joi.object({
    "method": joi.string().valid("delivery", "pickup").required(),
    "address": joi.string().when("method", is_="delivery",
                                 then=joi.string().required()),
})
joi.validate(df, schema, order_by=["order_id"]).violations() \
   .show(truncate=False)   # order 3: "address" is required
spark.stop()
