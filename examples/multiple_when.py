"""Port of the reference's examples/multipleWhen.js: stacked
conditionals on one key."""
import joi_spark as joi
from joi_spark.session import get_spark

spark = get_spark("local[4]")
df = spark.createDataFrame(
    [(1, "a", "x", 5.0), (2, "b", "y", 5.0), (3, "a", "y", 50.0)],
    "id bigint, kind string, mode string, amount double")

schema = joi.object({
    "amount": joi.number()
        .when("kind", is_="a", then=joi.number().max(10))
        .when("mode", is_="y", then=joi.number().min(1)),
    "kind": joi.string(), "mode": joi.string(),
})
joi.validate(df, schema, order_by=["id"],
             prefs={"abort_early": False}).violations().show(truncate=False)
spark.stop()
