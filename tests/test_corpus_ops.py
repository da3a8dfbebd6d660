"""PII scrubbing and deterministic splitting
(joi_spark.operators.corpus)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from joi_spark.operators import corpus as CP


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (0, "write to alice@example.com or +4915112345678 today"),
        (1, "server 192.168.0.1 failed, card 4111111111111111 charged"),
        (2, "ssn 123-45-6789 and id 550e8400-e29b-41d4-a716-446655440000"),
        (3, "nothing sensitive in this one at all"),
        (4, "call 555-867-5309 now"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_pii_scrub_redacts_and_counts(pii_docs):
    out = {r["doc_id"]: r for r in CP.pii_scrub(pii_docs).collect()}
    assert out[0]["n_email"] == 1 and out[0]["n_phone"] == 1
    assert "[EMAIL]" in out[0]["text"] and "[PHONE]" in out[0]["text"]
    assert "alice" not in out[0]["text"]
    assert out[1]["n_ip"] == 1 and out[1]["n_card_like"] == 1
    assert out[1]["text"] == "server [IP] failed, card [CARD] charged"
    assert out[2]["n_ssn"] == 1 and out[2]["n_guid"] == 1
    assert out[3]["n_pii"] == 0
    assert out[3]["text"] == "nothing sensitive in this one at all"
    assert out[4]["n_phone"] == 1 and "[PHONE]" in out[4]["text"]


def test_pii_scrub_sequential_consumption(spark):
    # the ssn pattern must consume 123-45-6789 BEFORE the phone/card
    # patterns see the text; the ip must not be double counted as card
    df = spark.createDataFrame([(0, "123-45-6789 10.0.0.1")],
                               "doc_id bigint, text string")
    r = CP.pii_scrub(df).collect()[0]
    assert r["n_ssn"] == 1 and r["n_phone"] == 0
    assert r["n_ip"] == 1 and r["n_card_like"] == 0
    assert r["text"] == "[SSN] [IP]"


def test_pii_scrub_category_subset(pii_docs):
    out = CP.pii_scrub(pii_docs, categories=["email"])
    assert set(out.columns) == {"doc_id", "text", "n_email", "n_pii"}
    r = {x["doc_id"]: x for x in out.collect()}
    assert r[0]["n_email"] == 1
    # phone untouched when its category is off
    assert "+4915112345678" in r[0]["text"]


def test_pii_scrub_map_only(pii_docs):
    plan = CP.pii_scrub(pii_docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_hash_split_deterministic_and_python_parity(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)],
                               "doc_id bigint")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {r["doc_id"]: r["split"]
           for r in CP.hash_split(df, weights=w, seed="s").collect()}

    def expect(i):
        h = hashlib.md5(f"s:{i}".encode()).hexdigest()[:8]
        v = int(h, 16) / 16 ** 8
        if v < 0.8:
            return "train"
        if v < 0.9:
            return "val"
        return "test"

    assert all(got[i] == expect(i) for i in range(2000))
    # roughly the right proportions at n=2000
    n_train = sum(1 for s in got.values() if s == "train")
    assert 0.75 < n_train / 2000 < 0.85


def test_hash_split_stable_under_repartition(spark):
    df = spark.createDataFrame([(i,) for i in range(500)],
                               "doc_id bigint")
    a = {r["doc_id"]: r["split"]
         for r in CP.hash_split(df, seed="x").collect()}
    b = {r["doc_id"]: r["split"]
         for r in CP.hash_split(df.repartition(7), seed="x").collect()}
    assert a == b


def test_hash_split_rejects_bad_weights(spark):
    df = spark.createDataFrame([(1,)], "doc_id bigint")
    with pytest.raises(ValueError):
        CP.hash_split(df, weights={"a": 0.5, "b": 0.6})


def test_chunk_documents(spark):
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(0, text), (1, "a b c")],
                               "doc_id bigint, text string")
    out = CP.chunk_documents(df, chunk_tokens=4, overlap=1)
    rows = sorted([(r["doc_id"], r["chunk_idx"], r["chunk"])
                   for r in out.collect()])
    # stride 3: starts 0,3,6 cover w0..w9 (last window short)
    assert rows == [
        (0, 0, "w0 w1 w2 w3"),
        (0, 1, "w3 w4 w5 w6"),
        (0, 2, "w6 w7 w8 w9"),
        (1, 0, "a b c"),                      # shorter than one window
    ]
    counts = {(r["doc_id"], r["chunk_idx"]): r["n_chunk_tokens"]
              for r in out.collect()}
    assert counts[(0, 2)] == 4 and counts[(1, 0)] == 3


def test_chunk_documents_no_overlap_covers_everything(spark):
    text = " ".join(f"w{i}" for i in range(250))
    df = spark.createDataFrame([(0, text)], "doc_id bigint, text string")
    rows = CP.chunk_documents(df, chunk_tokens=100).collect()
    assert sum(r["n_chunk_tokens"] for r in rows) == 250
    assert [r["chunk_idx"] for r in sorted(rows, key=lambda r: r["chunk_idx"])] == [0, 1, 2]


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        CP.chunk_documents(df, chunk_tokens=4, overlap=4)


def test_chunk_documents_empty_and_null_yield_no_chunks(spark):
    df = spark.createDataFrame([(0, ""), (1, "   "), (2, None), (3, "x y")],
                               "doc_id bigint, text string")
    rows = CP.chunk_documents(df, chunk_tokens=4).collect()
    assert [(r["doc_id"], r["chunk"]) for r in rows] == [(3, "x y")]


def test_corpus_report_per_group_card(spark):
    from joi_spark.operators.corpus import corpus_report
    rows = [
        (0, "a b c", "en", "s1"),
        (1, "a b c", "en", "s1"),          # exact dup of 0, same group
        (2, "a b c", "de", "s2"),          # cross-group copy counts too
        (3, "x y", "de", "s1"),
        (4, None, "en", "s2"),             # null text: 0 tokens, no dup
        (5, "p q r s", None, "s2"),        # null lang: excluded from mix
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string")
    got = {r["source"]: r.asDict()
           for r in corpus_report(df).collect()}
    s1, s2 = got["s1"], got["s2"]
    assert s1["n_docs"] == 3 and s1["n_tokens"] == 3 + 3 + 2
    assert s1["dup_docs"] == 2 and s1["dup_frac"] == 2 / 3
    assert s1["n_langs"] == 2 and s1["top_lang"] == "de" or \
           s1["top_lang"] == "en"   # en 2 vs de 1 -> en
    assert s1["top_lang"] == "en"
    assert s2["n_docs"] == 3 and s2["dup_docs"] == 1
    assert s2["n_tokens"] == 3 + 0 + 4
    assert s2["min_tokens"] == 0 and s2["max_tokens"] == 4
    assert s2["n_langs"] == 2      # en + de (null excluded)
    # s2 langs: en(1 from doc4), de(1 from doc2) -> tie, lex smaller
    assert s2["top_lang"] == "de"


def test_corpus_report_modal_lang_tiebreak(spark):
    from joi_spark.operators.corpus import corpus_report
    rows = [(0, "t", "zh", "s"), (1, "u", "aa", "s")]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string")
    got = corpus_report(df).collect()[0]
    assert got["top_lang"] == "aa"
