"""JSONPath-subset extraction.

The reference's `jsonpath` matcher/module type evaluates jayway
JSONPath over the record payload and returns a collection of key
strings (reference module/impl/ModuleJsonPath.java:30-70,
matchkey/impl/MatchKeyJsonPath.java:24-52). The expressions that
actually occur (tests + README) are of the shape:

    $.inventory.issn[*]
    $.marc.fields[*].001
    $.holdingsRecords[*].permanentLocationDeref

i.e. dotted field access with `[*]` array wildcards and `[n]`
indexing. We compile that subset to a fast pure-Python evaluator and
ship it as an Arrow-batched Pandas UDF (payload stays a JSON string
column; per SURVEY.md §1.2 the payload is schema-on-read, so a typed
Catalyst expression can't bind to it).

Strings are returned as-is; numbers are coerced to strings (reference
ModuleJsonPath returns jayway's mixed list and Storage coerces,
Storage.java:317-339); other node types are skipped.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable, Iterable

import pandas as pd
from pyspark.sql import functions as F, types as T

_STEP = re.compile(
    r"""
    \.(?P<field>[^.\[\]]+)      # .field  (tags like 001 allowed)
    | \[(?P<index>\d+)\]        # [0]
    | \[\*\]                    # [*]
    """,
    re.VERBOSE,
)


class JsonPathError(ValueError):
    pass


def compile_jsonpath(expr: str) -> Callable[[object], list[str]]:
    """Compile `$.a.b[*].c`-style expressions to evaluator(obj)->[str]."""
    if not expr.startswith("$"):
        raise JsonPathError(f"jsonpath must start with $: {expr!r}")
    pos, steps = 1, []
    while pos < len(expr):
        m = _STEP.match(expr, pos)
        if not m:
            raise JsonPathError(f"unsupported jsonpath at: {expr[pos:]!r}")
        if m.group("field") is not None:
            steps.append(("field", m.group("field")))
        elif m.group("index") is not None:
            steps.append(("index", int(m.group("index"))))
        else:
            steps.append(("wild", None))
        pos = m.end()

    def walk(nodes: Iterable, i: int) -> list:
        if i == len(steps):
            return list(nodes)
        kind, arg = steps[i]
        nxt = []
        for n in nodes:
            if kind == "field":
                if isinstance(n, dict) and arg in n:
                    nxt.append(n[arg])
            elif kind == "index":
                if isinstance(n, list) and arg < len(n):
                    nxt.append(n[arg])
            else:  # wildcard
                if isinstance(n, list):
                    nxt.extend(n)
                elif isinstance(n, dict):
                    nxt.extend(n.values())

        return walk(nxt, i + 1)

    def evaluate(obj: object) -> list[str]:
        out = []
        for v in walk([obj], 0):
            if isinstance(v, str):
                out.append(v)
            elif isinstance(v, bool):
                continue
            elif isinstance(v, (int, float)):
                out.append(str(int(v)) if float(v).is_integer() else str(v))
        return out

    return evaluate


def jsonpath_array_udf(expr: str):
    """Pandas UDF: payload JSON string column → array<string> of matches."""
    evaluate = compile_jsonpath(expr)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def extract(payload: pd.Series) -> pd.Series:
        def one(s):
            if s is None:
                return []
            try:
                return evaluate(json.loads(s))
            except (ValueError, TypeError):
                return []

        return payload.map(one)

    return extract


def jsonpath_first_udf(expr: str):
    """Pandas UDF: payload JSON string → first match or null (used for
    localIdPath overrides, reference IngestWriteStream.java:149-167)."""
    evaluate = compile_jsonpath(expr)

    @F.pandas_udf(T.StringType())
    def extract(payload: pd.Series) -> pd.Series:
        def one(s):
            if s is None:
                return None
            try:
                vals = evaluate(json.loads(s))
            except (ValueError, TypeError):
                return None
            return vals[0] if vals else None

        return payload.map(one)

    return extract
