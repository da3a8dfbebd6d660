"""References into sibling columns / global context.

Models the reference's ``Joi.ref(key)`` (reference: lib/ref.js:22-72):
- ``ref('other')``      → sibling column → compiles to ``F.col('other')``
- ``ref('$name')``      → global context → compiles to ``F.lit(context[name])``
- ``ref('.')``          → self value
Ancestor paths (``...key``) are parsed but at table level every sibling is a
column, so ancestors collapse to the row (reference: lib/ref.js:276-296).
"""

from __future__ import annotations


class Ref:
    __slots__ = ("key", "kind", "ancestor", "path")

    def __init__(self, key: str):
        raw = key
        if key.startswith("$"):
            self.kind = "global"
            key = key[1:]
            self.ancestor = None
        elif key.startswith("#"):
            self.kind = "local"
            key = key[1:]
            self.ancestor = None
        elif key.startswith("/"):
            self.kind = "value"
            key = key[1:]
            self.ancestor = "root"
        else:
            self.kind = "value"
            n = 0
            while n < len(key) and key[n] == ".":
                n += 1
            # '.a' = self-relative, '..a' = parent (default), etc.
            # (reference: lib/ref.js:276-296)
            self.ancestor = max(n - 1, 0) if n else 1
            key = key[n:]
        self.key = key
        self.path = key.split(".") if key else []
        if not key and raw not in (".",):
            raise ValueError(f"invalid reference key: {raw!r}")

    @property
    def display(self) -> str:
        """How the reference renders inside messages
        (reference: lib/ref.js:163-176 toString → 'ref:key')."""
        prefix = {"global": "global:", "local": "local:", "value": "ref:"}[self.kind]
        return f"{prefix}{self.key}"

    def describe(self) -> dict:
        d: dict = {"ref": {"path": self.path}}
        if self.kind != "value":
            d["ref"]["type"] = self.kind
        return d

    def __eq__(self, other):
        return (isinstance(other, Ref) and self.key == other.key
                and self.kind == other.kind)

    def __hash__(self):
        return hash((self.kind, self.key))

    def __repr__(self):  # pragma: no cover
        return f"ref({self.display!r})"


def ref(key: str) -> Ref:
    return Ref(key)


def is_ref(v) -> bool:
    return isinstance(v, Ref)
