"""SparkSession factory tuned for the validation workload."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(master: str | None = None, app: str = "joi_spark",
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    cores = os.cpu_count() or 8
    builder = (
        SparkSession.builder
        .master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or min(cores, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # InferFiltersFromGenerate copies the explode's child expression
        # into inferred filters; with wide schemas (hundreds of compiled
        # checks in one violation array) the repeated tree duplication
        # OOMs the driver during optimization.  The rule only pre-prunes
        # empty arrays — our arrays are built after the row filter, so
        # excluding it costs nothing.
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer."
                "InferFiltersFromGenerate")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # PySpark 4.x captures a Python stack trace on EVERY DataFrame
        # API call for error call-site reporting (errors/utils.py
        # _with_origin) — ~5 ms of py4j round-trips per call.  Compiled
        # plans issue thousands of Column calls, so this is pure driver
        # overhead at plan-build time (measured: string_formats build
        # 3.4 s → sub-second with it off).  Error *content* is
        # unaffected; only the "was created at <file:line>" decoration
        # is dropped.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # engine semantics depend on try_cast-style conversion, not errors
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("JOI_SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
