"""Match-key extraction: global_records → record_match_values edges.

The reference resolves each matchkey config to a matcher (jsonpath or
JavaScript module) and calls it per record on a worker thread
(reference server/.../Storage.java:309-351). We resolve to either a
compiled jsonpath evaluator or a registered Python function, and run it
as one Arrow-batched Pandas UDF over the records — dedup (HashSet in
Storage.java:356-358) becomes array_distinct, 600-char truncation
happens in the clustering operator.

`update ∈ {ingest, manual}` (Storage.java:312-314): manual pools are
skipped at ingest time and only populated by `initialize_pool` (full
rebuild) — enforced by the caller passing the right config subset.
"""

from __future__ import annotations

import json
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from mod_reservoir_spark.functions.jsonpath import compile_jsonpath

# registry of named python matcher modules: "module::function"
_PY_MODULES: dict[str, Callable[[dict], list[str]]] = {}


def _register_builtins():
    """Built-in matcher modules (the reference ships goldrush as a JS
    code module; ours is the Python port, same invocation name)."""
    from mod_reservoir_spark.functions.goldrush import (
        goldrush2021_keys,
        goldrush_keys,
    )

    _PY_MODULES.setdefault("goldrush::matchkey", goldrush_keys)
    _PY_MODULES.setdefault("goldrush", goldrush_keys)
    _PY_MODULES.setdefault("goldrush2021::matchkey", goldrush2021_keys)
    _PY_MODULES.setdefault("goldrush2021", goldrush2021_keys)


def register_module(name: str, fn: Callable[[dict], list[str]]):
    """Register a matcher module: a Python callable (payload dict in,
    collection of key strings out) or a JsModuleFunction
    (functions/jsmodules.py — real node-executed JS with the reference
    contract, module/impl/ModuleJavaScript.java:30-105; detected by
    its ``batch`` attribute and invoked once per Arrow batch)."""
    _PY_MODULES[name] = fn


def get_module(name: str) -> Callable[[dict], list[str]]:
    _register_builtins()
    return _PY_MODULES[name]


def _matcher_fn(config: dict) -> Callable[[dict], list[str]]:
    """Resolve a match_key_config row to payload→keys callable.

    config keys: id, matcher ("module::function" or None),
    method ("jsonpath"), params (JSON string, e.g. {"expr": "$..."}).
    """
    matcher = config.get("matcher")
    if matcher:
        _register_builtins()
        name = matcher.split("::")[0] if "::" in matcher else matcher
        fn = _PY_MODULES.get(matcher) or _PY_MODULES.get(name)
        if fn is None:
            raise KeyError(f"unregistered matcher module: {matcher!r}")
        return fn
    if config.get("method") == "jsonpath":
        params = config.get("params")
        params = json.loads(params) if isinstance(params, str) else (params or {})
        evaluate = compile_jsonpath(params["expr"])
        return evaluate
    raise ValueError(f"matchkey config {config.get('id')!r} has no matcher/method")


def matcher_udf(config: dict, on_error: str = "raise"):
    """Arrow-batched payload→keys UDF.

    on_error='raise' (default) re-raises a matcher exception, failing
    the ingest job — the reference contract, where a throwing JS matcher
    fails the request rather than silently degrading (ADVICE r1).
    on_error='ignore' emits [] for the failing record (documented
    deviation for salvage runs; pair with match_value_errors to count)."""
    fn = _matcher_fn(config)
    cfg_id = config.get("id")
    batched = hasattr(fn, "batch")

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def extract(payload: pd.Series) -> pd.Series:
        def one(s):
            if s is None:
                return []
            try:
                obj = json.loads(s)
            except (ValueError, TypeError):
                return []
            try:
                vals = fn(obj)
            except Exception as e:
                if on_error == "raise":
                    raise RuntimeError(
                        f"matcher {cfg_id!r} failed: {e!r}"
                    ) from e
                return []
            return _coerce_keys(vals)

        if not batched:
            return payload.map(one)

        # batch-aware module (JS subprocess): one subprocess for the
        # whole Arrow batch, per-record errors honored. The payload is
        # passed as its JSON STRING — the reference invokes modules
        # with input.encode() (ModuleJavaScript.java:104,120), so
        # tenant matchers call JSON.parse(record) themselves. Payloads
        # that are not valid JSON yield [] (as in the per-record path)
        # without reaching the module.
        raw, idx = [], []
        results = [[] for _ in range(len(payload))]
        for i, s in enumerate(payload):
            if s is None:
                continue
            try:
                json.loads(s)
            except (ValueError, TypeError):
                continue
            raw.append(s)
            idx.append(i)
        for i, (vals, err) in zip(idx, fn.batch(raw)):
            if err is not None:
                if on_error == "raise":
                    raise RuntimeError(
                        f"matcher {cfg_id!r} failed: {err}"
                    )
                continue
            results[i] = _coerce_keys(vals)
        return pd.Series(results)

    return extract


def _coerce_keys(vals) -> list[str]:
    """Collection coercion per reference executeAsCollection
    (ModuleJavaScript.java:124-146): strings kept, numbers stringified
    (integral floats without the .0), everything else dropped."""
    if isinstance(vals, str):
        vals = [vals]
    out = []
    for v in vals or []:
        if isinstance(v, str):
            out.append(v)
        elif isinstance(v, (int, float)) and not isinstance(v, bool):
            out.append(str(int(v)) if float(v).is_integer() else str(v))
    return out


def matcher_error_udf(config: dict):
    """Per-record matcher error (string) or None — the diagnostic
    companion to matcher_udf(on_error='ignore')."""
    fn = _matcher_fn(config)
    batched = hasattr(fn, "batch")

    @F.pandas_udf(T.StringType())
    def probe(payload: pd.Series) -> pd.Series:
        def one(s):
            if s is None:
                return None
            try:
                obj = json.loads(s)
            except (ValueError, TypeError) as e:
                return f"bad payload json: {e}"
            try:
                fn(obj)
                return None
            except Exception as e:
                return repr(e)

        if not batched:
            return payload.map(one)

        raw, idx = [], []
        results: list[str | None] = [None] * len(payload)
        for i, s in enumerate(payload):
            if s is None:
                continue
            try:
                json.loads(s)
            except (ValueError, TypeError) as e:
                results[i] = f"bad payload json: {e}"
                continue
            raw.append(s)
            idx.append(i)
        for i, (_, err) in zip(idx, fn.batch(raw)):
            results[i] = err
        return pd.Series(results)

    return probe


def extract_match_values(
    records: DataFrame, configs: list[dict], on_error: str = "raise"
) -> DataFrame:
    """Run every (ingest-mode) matcher over the records and union the
    edge tables: (global_id, match_key_config_id, match_value).

    One pass per pool; each is a narrow map + explode (no shuffle).
    Values are deduped per record (set semantics, Storage.java:356-358).
    The empty string is a REGULAR clusterable value — the reference
    inserts '' through truncatedKeys like any other key
    (Storage.java:353-361), so records whose matcher yields only ''
    cluster together rather than becoming singletons (ADVICE r1)."""
    parts = []
    for cfg in configs:
        udf = matcher_udf(cfg, on_error=on_error)
        parts.append(
            records.select(
                "global_id",
                F.lit(cfg["id"]).alias("match_key_config_id"),
                F.explode(
                    F.array_distinct(udf(F.col("payload")))
                ).alias("match_value"),
            ).filter(F.col("match_value").isNotNull())
        )
    if not parts:
        raise ValueError("no matchkey configs supplied")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def match_value_errors(
    records: DataFrame, configs: list[dict]
) -> DataFrame:
    """(global_id, match_key_config_id, error) for every record whose
    matcher raised — surface for operators running on_error='ignore'."""
    parts = []
    for cfg in configs:
        probe = matcher_error_udf(cfg)
        parts.append(
            records.select(
                "global_id",
                F.lit(cfg["id"]).alias("match_key_config_id"),
                probe(F.col("payload")).alias("error"),
            ).filter(F.col("error").isNotNull())
        )
    if not parts:
        raise ValueError("no matchkey configs supplied")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
