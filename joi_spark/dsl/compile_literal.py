"""Sugar plain Python literals into schemas
(reference: lib/compile.js:31-77 Compile.schema).

- dict        → object().keys({...})
- list/tuple  → alternatives().try_(...) of compiled entries
- re.Pattern  → string().pattern(...)
- scalar      → any().valid(scalar) (with None → valid(None))
- Schema/Ref  → passthrough
"""

from __future__ import annotations

import re

from joi_spark.dsl.base import Schema
from joi_spark.dsl.ref import Ref


def compile_literal(value) -> Schema:
    from joi_spark.dsl.types import AnySchema, StringSchema
    from joi_spark.dsl.objects import AlternativesSchema, ObjectSchema

    if isinstance(value, Schema):
        return value
    if isinstance(value, Ref):
        return AnySchema().valid(value)
    if isinstance(value, re.Pattern):
        return StringSchema().pattern(value)
    if isinstance(value, dict):
        return ObjectSchema().keys({k: compile_literal(v) for k, v in value.items()})
    if isinstance(value, (list, tuple)):
        schemas = [compile_literal(v) for v in value]
        # all-scalar list sugars to valid(...) like the reference
        # (lib/compile.js:53-59)
        if all(not isinstance(v, (Schema, Ref, dict, list, tuple, re.Pattern))
               for v in value):
            return AnySchema().valid(*value)
        return AlternativesSchema().try_(*schemas)
    return AnySchema().valid(value)
