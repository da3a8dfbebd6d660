"""Mergeable-sketch operators (joi_spark.operators.sketches +
stats.epoch_anomalies): Bloom referential, HLL cardinality manifests,
quantile-grid Wasserstein drift, cross-epoch anomaly screen.

The Bloom filter carries the engine's one-sided-error contract for
link() at dimension sizes past broadcastability (reference:
lib/types/link.js:35-59 — link resolution must never invent a broken
link; missing one under saturation is the documented approximation).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from joi_spark.operators import dataset as DS
from joi_spark.operators import sketches as SK
from joi_spark.operators import stats as ST

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    df.persist()
    df.count()
    return df


@pytest.fixture(scope="module")
def part_dim(spark):
    return spark.read.parquet(f"{SF}/part.parquet") \
        .filter(F.col("p_partkey") < 150)


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives(spark, part_dim):
    """Every key that went into the filter must probe true — the
    property that makes reported orphans definite."""
    bloom = SK.bloom_finalize(SK.bloom_build(part_dim, "p_partkey",
                                             n_bits=1 << 14, n_hashes=5),
                              n_bits=1 << 14)
    probed = SK.bloom_probe(part_dim, "p_partkey", bloom,
                            n_bits=1 << 14, n_hashes=5)
    assert probed.filter(~F.col("bloom_maybe")).count() == 0


def test_referential_bloom_matches_exact(spark, lineitem, part_dim):
    """At a properly sized n_bits the Bloom path reproduces the exact
    anti-join violation set (fpp ~ (k*n/m)^k ~ 1e-10 here)."""
    kw = dict(order_by=["l_orderkey", "l_linenumber"])
    cols = ["l_orderkey", "l_linenumber", "code", "message", "severity"]
    got = {tuple(r) for r in SK.referential_bloom(
        lineitem, "l_partkey", part_dim, "p_partkey", **kw)
        .select(*cols).collect()}
    want = {tuple(r) for r in DS.referential(
        lineitem, "l_partkey", part_dim, "p_partkey", **kw)
        .select(*cols).collect()}
    assert got == want and len(want) > 0


def test_referential_bloom_one_sided_under_saturation(spark, lineitem,
                                                      part_dim):
    """A deliberately tiny filter (saturated bitmap) may MISS orphans
    but must never report a resolvable key as broken."""
    kw = dict(order_by=["l_orderkey", "l_linenumber"])
    cols = ["l_orderkey", "l_linenumber", "code", "message", "severity"]
    tiny = {tuple(r) for r in SK.referential_bloom(
        lineitem, "l_partkey", part_dim, "p_partkey",
        n_bits=256, n_hashes=2, **kw).select(*cols).collect()}
    exact = {tuple(r) for r in DS.referential(
        lineitem, "l_partkey", part_dim, "p_partkey", **kw)
        .select(*cols).collect()}
    assert tiny <= exact
    assert len(tiny) < len(exact)  # 256 bits for ~150 keys IS saturated


def test_bloom_null_keys_pass(spark, part_dim):
    df = spark.createDataFrame([(None,), (1,), (99999,)], "k: int")
    v = SK.referential_bloom(df, "k", part_dim, "p_partkey",
                             order_by=["k"])
    keys = [r["k"] for r in v.collect()]
    assert keys == [99999]  # NULL absent, resolvable key absent


def test_bloom_partitioned_build_merges_to_global(spark, part_dim):
    """Per-epoch word tables OR together into exactly the filter a
    global build produces — the incremental-manifest property."""
    dim = part_dim.withColumn("epoch", F.col("p_partkey") % 3)
    per = SK.bloom_build(dim, "p_partkey", n_bits=1 << 12, n_hashes=3,
                         partition_col="epoch")
    merged = {(r["word_idx"], r["bits"])
              for r in SK.bloom_merge(per, "epoch").collect()}
    direct = {(r["word_idx"], r["bits"])
              for r in SK.bloom_build(part_dim, "p_partkey",
                                      n_bits=1 << 12,
                                      n_hashes=3).collect()}
    assert merged == direct


def test_bloom_probe_no_fact_shuffle(spark, lineitem, part_dim):
    """The scale contract: probing never shuffles the fact table —
    the finalized filter arrives by broadcast."""
    v = SK.referential_bloom(lineitem, "l_partkey", part_dim,
                             "p_partkey",
                             order_by=["l_orderkey", "l_linenumber"])
    plan = v._jdf.queryExecution().executedPlan().toString()
    fact_side = plan.split("Broadcast")[0]
    assert "Exchange hashpartitioning" not in fact_side
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# HLL manifests
# ---------------------------------------------------------------------------

def test_hll_estimates_within_tolerance(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet") \
        .withColumn("epoch", F.year("o_orderdate"))
    man = SK.cardinality_manifest(orders, ["o_custkey"],
                                  partition_col="epoch")
    exact = {r["epoch"]: r["n"] for r in
             orders.groupBy("epoch")
                   .agg(F.countDistinct("o_custkey").alias("n")).collect()}
    for r in man.collect():
        assert abs(r["estimate"] - exact[r["partition"]]) \
            <= 0.05 * exact[r["partition"]]


def test_hll_merge_equals_whole_table_sketch(spark):
    """Union of per-partition sketches must estimate like one sketch
    over the whole table — merging loses nothing (the property that
    lets manifests update without rescanning)."""
    orders = spark.read.parquet(f"{SF}/orders.parquet") \
        .withColumn("epoch", F.year("o_orderdate"))
    man = SK.cardinality_manifest(orders, ["o_custkey"],
                                  partition_col="epoch")
    merged = SK.cardinality_merge(man).first()
    whole = orders.agg(F.hll_sketch_estimate(
        F.hll_sketch_agg(F.col("o_custkey").cast("string"), 12))
        .alias("e")).first()["e"]
    assert merged["estimate"] == whole
    assert merged["n_rows"] == orders.count()


# ---------------------------------------------------------------------------
# Quantile drift (Wasserstein-1)
# ---------------------------------------------------------------------------

def test_quantile_drift_zero_for_identical_epochs(spark, lineitem):
    a = lineitem.withColumn("epoch", F.lit(1))
    b = lineitem.withColumn("epoch", F.lit(2))
    out = SK.quantile_drift(a.unionByName(b), "l_extendedprice",
                            exact=True).collect()
    assert [r["w1"] for r in out] == [0.0]


def test_quantile_drift_recovers_known_shift(spark):
    rows = [(1, float(i)) for i in range(1000)] \
         + [(2, float(i) + 10.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "epoch: int, v: double")
    out = SK.quantile_drift(df, "v", exact=True).collect()
    assert len(out) == 1 and abs(out[0]["w1"] - 10.0) < 1e-6


def test_quantile_drift_approx_close_to_exact(spark, lineitem):
    df = lineitem.withColumn("epoch", F.year("l_shipdate"))
    exact = {r["epoch"]: r["w1"] for r in
             SK.quantile_drift(df, "l_extendedprice",
                               exact=True).collect()}
    approx = {r["epoch"]: r["w1"] for r in
              SK.quantile_drift(df, "l_extendedprice",
                                exact=False).collect()}
    assert set(exact) == set(approx)
    spread = max(exact.values()) - min(0.0, min(exact.values()))
    for e in exact:
        # KLL with accuracy 10000 tracks the exact grid closely
        assert abs(exact[e] - approx[e]) <= max(0.05 * spread, 50.0)


# ---------------------------------------------------------------------------
# Epoch anomalies
# ---------------------------------------------------------------------------

def test_epoch_anomalies_flags_injected_epoch(spark):
    rows = [(e, 100.0 + (i % 7)) for e in range(5) for i in range(200)] \
         + [(9, 500.0 + (i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "epoch: int, v: double")
    out = ST.epoch_anomalies(df, ["v"], epoch_col="epoch",
                             z_threshold=2.0)
    flagged = {r["epoch"] for r in
               out.filter("flagged AND metric = 'mean'").collect()}
    assert flagged == {9}


def test_epoch_anomalies_constant_metric_never_flagged(spark):
    rows = [(e, float(e)) for e in range(4) for _ in range(10)]
    df = spark.createDataFrame(rows, "epoch: int, v: double")
    out = ST.epoch_anomalies(df, ["v"], epoch_col="epoch")
    nf = out.filter("metric = 'null_frac'").collect()
    assert all(r["z"] == 0.0 and not r["flagged"] for r in nf)
