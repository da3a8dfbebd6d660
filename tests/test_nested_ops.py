"""Struct-column keys, array ordered(), regex rename."""

from __future__ import annotations

import re

import joi_spark as joi


def test_struct_column_keys(spark):
    df = spark.createDataFrame(
        [(1, ("alice", 30)), (2, ("", 16)), (3, ("bob", None))],
        "id bigint, user struct<name:string, age:int>")
    schema = joi.object({
        "user": joi.object({
            "name": joi.string().min(2),
            "age": joi.number().min(18).required(),
        }),
    })
    res = joi.validate(df, schema, order_by=["id"],
                       prefs={"abort_early": False})
    got = sorted((r["id"], r["path"], r["code"])
                 for r in res.violations().collect())
    assert got == [
        (2, "user.age", "number.min"),
        (2, "user.name", "string.empty"),
        (3, "user.age", "any.required"),
    ]


def test_null_parent_skips_children(spark):
    """A required child inside an ABSENT (null) parent struct must not
    fire — the reference never recurses into a missing object
    (ADVICE round 1, item 1)."""
    df = spark.createDataFrame(
        [(1, ("alice", 30)), (2, None), (3, ("bob", None))],
        "id bigint, user struct<name:string, age:int>")
    schema = joi.object({
        "user": joi.object({
            "name": joi.string(),
            "age": joi.number().required(),
        }),
    })
    res = joi.validate(df, schema, order_by=["id"],
                       prefs={"abort_early": False})
    got = [(r["id"], r["path"], r["code"])
           for r in res.violations().collect()]
    assert got == [(3, "user.age", "any.required")]


def test_null_parent_skips_missing_field_check(spark):
    """Statically-missing required field: fails only where the parent
    struct is present."""
    df = spark.createDataFrame(
        [(1, ("x",)), (2, None)], "id bigint, user struct<name:string>")
    schema = joi.object({
        "user": joi.object({"email": joi.string().required()}),
    })
    res = joi.validate(df, schema, order_by=["id"])
    got = [(r["id"], r["path"], r["code"])
           for r in res.violations().collect()]
    assert got == [(1, "user.email", "any.required")]


def test_struct_missing_required_field(spark):
    df = spark.createDataFrame([(1, ("x",))],
                               "id bigint, user struct<name:string>")
    schema = joi.object({
        "user": joi.object({"email": joi.string().required()}),
    })
    res = joi.validate(df, schema, order_by=["id"])
    rows = res.violations().collect()
    assert [(r["path"], r["code"], r["message"]) for r in rows] == \
        [("user.email", "any.required", '"user.email" is required')]


def test_array_ordered(spark):
    df = spark.createDataFrame(
        [(1, ["sys", "42"]), (2, ["sys", "xx"]), (3, ["sys", "42", "extra"])],
        "id bigint, parts array<string>")
    schema = joi.object({
        "parts": joi.array().ordered(joi.string().min(2),
                                     joi.string().pattern("^[0-9]+$")),
    })
    res = joi.validate(df, schema, order_by=["id"],
                       prefs={"abort_early": False})
    got = sorted((r["id"], r["code"]) for r in res.violations().collect())
    assert got == [(2, "array.includes"), (3, "array.orderedLength")]
    msg = {r["id"]: r["message"] for r in res.violations().collect()}
    assert msg[3] == '"parts" must contain at most 2 items'


def test_regex_rename(spark):
    df = spark.createDataFrame([(1, "x")], "id bigint, raw_name string")
    schema = joi.object({"name": joi.string().min(2)}) \
        .rename(re.compile("^raw_"), "")
    res = joi.validate(df, schema, order_by=["id"],
                       prefs={"abort_early": False})
    rows = res.violations().collect()
    assert [(r["path"], r["code"]) for r in rows] == [("name", "string.min")]
    assert "name" in res.value.columns and "raw_name" not in res.value.columns


def test_object_json_coercion(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 1}'), (2, '{"a":1,"b":2}'), (3, 'not json')],
        "id bigint, props string")
    schema = joi.object({"props": joi.object().min(2)})
    res = joi.validate(df, schema, order_by=["id"],
                       prefs={"abort_early": False})
    got = [(r["id"], r["code"], r["message"])
           for r in res.violations().collect()]
    assert got == [
        (1, "object.min", '"props" must have at least 2 keys'),
        (3, "object.base", '"props" must be of type object'),
    ]
    vals = {r["id"]: r["props"] for r in res.value.collect()}
    assert vals[2] == {"a": "1", "b": "2"} and vals[3] is None


def test_map_pattern_keys(spark):
    df = spark.createDataFrame(
        [(1, {"m_a": "5", "m_b": "7"}),
         (2, {"m_a": "xx"}),
         (3, {"other": "1"})],
        "id bigint, props map<string,string>")
    schema = joi.object({
        "props": joi.object().pattern("^m_", joi.number()).unknown(False),
    })
    res = joi.validate(df, schema, order_by=["id"],
                       prefs={"abort_early": False})
    got = sorted((r["id"], r["code"]) for r in res.violations().collect())
    assert got == [(2, "object.pattern.match"), (3, "object.unknown")]
    msg = {r["id"]: r["message"] for r in res.violations().collect()}
    assert msg[2] == '"props" keys failed to match pattern requirements'


def test_nested_struct_unknown_policy(spark):
    """unknown(False) on a nested object flags non-null struct fields
    not declared in keys() (reference: lib/types/object.js:970-1077;
    null ≈ undefined, which Joi skips)."""
    df = spark.createDataFrame(
        [(1, ("a", "x")), (2, ("b", None)), (3, None)],
        "id bigint, user struct<name:string, extra:string>")
    schema = joi.object({
        "user": joi.object({"name": joi.string()}).unknown(False),
    })
    res = joi.validate(df, schema, order_by=["id"],
                       prefs={"abort_early": False})
    got = [(r["id"], r["path"], r["code"], r["message"])
           for r in res.violations().collect()]
    assert got == [(1, "user.extra", "object.unknown",
                    '"user.extra" is not allowed')]


def test_nested_struct_pattern_keys(spark):
    df = spark.createDataFrame(
        [(1, ("5", "x")), (2, ("abc", "x"))],
        "id bigint, m struct<m_a:string, other:string>")
    schema = joi.object({
        "m": joi.object({"other": joi.string()}).pattern("^m_", joi.number()),
    })
    res = joi.validate(df, schema, order_by=["id"],
                       prefs={"abort_early": False})
    got = [(r["id"], r["path"], r["code"])
           for r in res.violations().collect()]
    assert got == [(2, "m.m_a", "number.base")]


def test_nested_struct_key_count(spark):
    """Per-row min-keys over a struct counts non-null fields."""
    df = spark.createDataFrame(
        [(1, ("a", "b")), (2, ("a", None)), (3, None)],
        "id bigint, s struct<x:string, y:string>")
    schema = joi.object({
        "s": joi.object({"x": joi.string(), "y": joi.string()}).min(2),
    })
    res = joi.validate(df, schema, order_by=["id"],
                       prefs={"abort_early": False})
    got = [(r["id"], r["code"], r["message"])
           for r in res.violations().collect()]
    assert got == [(2, "object.min", '"s" must have at least 2 keys')]
