from __future__ import annotations

import pytest

from joi_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("local[4]", app="joi_spark_tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def transcripts(spark):
    from joi_spark.sources.transcripts import seeded_transcripts
    df = seeded_transcripts(spark, n_convs=20, turns_per_conv=10)
    df.persist()
    df.count()
    return df
