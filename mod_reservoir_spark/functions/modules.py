"""Code-module registry: named matcher/transformer functions.

The reference registers modules ``{id, type: jsonpath|javascript,
url|script, function}`` per tenant with caching and invocation as
``module::function`` (reference server/.../ReservoirService.java:
363-419, module/ModuleCache.java, module/impl/ModuleJavaScript.java).
``type: javascript`` modules execute for real: a sandboxed node
subprocess per Arrow batch (functions/jsmodules.py) runs the user's
ES-module export with the reference's invocation contract. Python
callables remain supported (``type: python``) for in-process modules.
The shared contracts:

- matcher: payload dict → collection of match-key strings
  (ModuleJavaScript.executeAsCollection:124-146)
- transformer: cluster dict → transformed MARC-in-JSON dict
  (ModuleJavaScript.execute:110-121; applied at export time,
  ClusterRecordStream.java:88-127)

``type: jsonpath`` modules are fully supported (script = the
expression, ModuleJsonPath.java:30-70).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from mod_reservoir_spark.functions.jsonpath import compile_jsonpath


@dataclass
class Module:
    id: str
    type: str  # jsonpath | python
    function: str | None = None
    script: str | None = None
    url: str | None = None
    fn: Callable | None = None


@dataclass
class ModuleRegistry:
    """CRUD + invocation cache (reference ModuleCacheImpl.java:40-80:
    per-tenant cache with purge/reload — here a plain dict; Spark
    serializes resolved closures to executors once per stage)."""

    modules: dict[str, Module] = field(default_factory=dict)

    def put(self, module: Module) -> None:
        self.modules[module.id] = module

    def get(self, module_id: str) -> Module:
        return self.modules[module_id]

    def delete(self, module_id: str) -> None:
        self.modules.pop(module_id, None)

    def purge(self) -> None:
        self.modules.clear()

    def list(self) -> list[Module]:
        return sorted(self.modules.values(), key=lambda m: m.id)

    def health(self) -> dict:
        """Operational status a deployment can poll: module counts by
        type plus the JS sandbox mode on this process — ``"netns"``
        (kernel-level egress block) vs ``"in-process"`` (API
        neutering; weaker — no DNS coverage) vs ``"unavailable"``
        (no node executable: javascript modules cannot run)."""
        from mod_reservoir_spark.functions import jsmodules

        by_type: dict[str, int] = {}
        for m in self.modules.values():
            by_type[m.type] = by_type.get(m.type, 0) + 1
        return {
            "modules": len(self.modules),
            "by_type": by_type,
            "js_sandbox_mode": (
                jsmodules.sandbox_mode()
                if jsmodules.node_available()
                else "unavailable"
            ),
        }

    def resolve(self, invocation: str) -> Callable:
        """'module::function' or bare module id → callable
        (reference ModuleInvocation.java:10-30)."""
        parts = invocation.split("::", 1)
        module_id = parts[0]
        m = self.get(module_id)
        if m.type == "jsonpath":
            return compile_jsonpath(m.script)
        if m.type == "python":
            if m.fn is None:
                raise ValueError(f"module {m.id} has no bound callable")
            return m.fn
        if m.type == "javascript":
            from mod_reservoir_spark.functions.jsmodules import (
                JsModuleFunction,
            )

            if not m.script:
                raise ValueError(
                    f"javascript module {m.id} needs inline script "
                    "(url fetch not supported — no network egress)"
                )
            fname = (
                parts[1] if len(parts) > 1 else (m.function or "matchkey")
            )
            return JsModuleFunction(
                m.script, function=fname, module_id=m.id
            )
        raise ValueError(f"unsupported module type {m.type!r}")


DEFAULT_REGISTRY = ModuleRegistry()


def register_defaults() -> ModuleRegistry:
    from mod_reservoir_spark.functions.goldrush import (
        goldrush2021_keys,
        goldrush_keys,
    )
    from mod_reservoir_spark.functions.transformers import marc_transformer

    DEFAULT_REGISTRY.put(
        Module(id="goldrush", type="python", function="matchkey", fn=goldrush_keys)
    )
    DEFAULT_REGISTRY.put(
        Module(
            id="goldrush2021",
            type="python",
            function="matchkey",
            fn=goldrush2021_keys,
        )
    )
    DEFAULT_REGISTRY.put(
        Module(
            id="marc-transformer",
            type="python",
            function="transform",
            fn=marc_transformer,
        )
    )
    return DEFAULT_REGISTRY
