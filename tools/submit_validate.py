"""spark-submit entry point for a checkpointed validation run.

    tools/build_pyfiles.sh   # → dist/joi_spark.zip
    spark-submit --py-files dist/joi_spark.zip tools/submit_validate.py \
        --input  <parquet-or-iceberg-table> \
        --ckpt   <checkpoint root> \
        --partition-col epoch

The job validates pending partitions (resume-aware via the per-partition
lineage manifest), writes violations + manifest, and prints a one-line
JSON summary.  On a real cluster nothing changes except the master URL —
every operator shuffles on fine-grained keys and aggregates partially,
so adding executors scales throughput (see BENCH.md scaling evidence).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--partition-col", default="epoch")
    ap.add_argument("--abort-early", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("joi_spark_validate").getOrCreate()

    import joi_spark as joi
    from joi_spark.checkpoint import CheckpointedRun

    schema = joi.object({
        "conv_id": joi.string().required().pattern("^c[0-9]{6,8}$"),
        "turn_idx": joi.number().integer().min(0).required(),
        "role": joi.string().valid("system", "user", "assistant", "tool")
                   .required(),
        "text": joi.string().max(8192),
        "tool": joi.string().min(1),
    })

    df = spark.read.parquet(args.input)
    run = CheckpointedRun(args.ckpt, schema, args.partition_col)
    t0 = time.time()
    summary = run.run(df, prefs={"abort_early": args.abort_early})
    summary["sec"] = round(time.time() - t0, 3)
    summary["constraint_hash"] = run.hash
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
