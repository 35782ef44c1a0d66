"""Real JavaScript code-module execution via a Node.js subprocess.

The reference embeds GraalVM polyglot JS in the server JVM
(server/.../module/impl/ModuleJavaScript.java:30-105) and resolves
``module::function`` invocations against ES-module exports. On Spark,
executors run Python workers, so the equivalent seam is a node
subprocess per Arrow batch: the module source ships inside the
picklable function object, is materialized once per worker process to
a private temp dir, and a fixed runner script streams JSON-line
payloads through the exported function. Node's permission model
(``--experimental-permission``) confines filesystem access to that
temp dir; unlike GraalVM host isolation it does not block network
egress — documented deviation, see COVERAGE.md.

Invocation contract mirrors ModuleJavaScript — the input is always
passed ENCODED as a JSON string (``input.encode()``,
ModuleJavaScript.java:104,120), so tenant modules written for the
reference (which call ``JSON.parse(record)`` themselves) run
unmodified:
- matcher: ``matchkey(recordStr)`` → string | array of strings
  (executeAsCollection, ModuleJavaScript.java:119-146)
- transformer: ``transform(clusterStr)`` → JSON string
  (execute, ModuleJavaScript.java:103-116)

One node process per batch (~60 ms startup) amortizes over the Arrow
batch rows; each record's error is reported individually so the
matcher on_error semantics match the Python module path.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import tempfile

_RUNNER_MJS = """
import { pathToFileURL } from 'url';
import { createInterface } from 'readline';
const [modPath, fnName] = process.argv.slice(2);
const mod = await import(pathToFileURL(modPath));
const fn = mod[fnName || 'matchkey'] ?? mod.default;
if (typeof fn !== 'function') {
  process.stderr.write('module has no function ' + fnName + '\\n');
  process.exit(2);
}
const rl = createInterface({ input: process.stdin, terminal: false });
for await (const line of rl) {
  if (!line.trim()) continue;
  let out;
  try {
    const v = fn(JSON.parse(line));
    out = JSON.stringify({ ok: v === undefined ? null : v });
    if (out === undefined) out = '{"ok":null}';
  } catch (e) {
    out = JSON.stringify({ err: String((e && e.message) || e) });
  }
  process.stdout.write(out + '\\n');
}
"""

# per-process cache: script sha -> directory holding runner + module
_MATERIALIZED: dict[str, str] = {}


def node_available() -> bool:
    return shutil.which("node") is not None


class JsModuleFunction:
    """A payload→value function backed by an ES-module export, executed
    in a sandboxed node subprocess. Picklable (carries the source
    text); also exposes ``batch`` so Arrow-batched callers amortize the
    subprocess startup over the whole batch."""

    def __init__(
        self,
        script: str,
        function: str = "matchkey",
        module_id: str = "",
        sandbox: bool = True,
        timeout: int = 300,
    ):
        self.script = script
        self.function = function
        self.module_id = module_id
        self.sandbox = sandbox
        self.timeout = timeout

    def _materialize(self) -> tuple[str, str]:
        key = hashlib.sha256(self.script.encode()).hexdigest()
        d = _MATERIALIZED.get(key)
        if d is None or not os.path.isdir(d):
            d = tempfile.mkdtemp(prefix="jsmod_")
            with open(os.path.join(d, "runner.mjs"), "w") as f:
                f.write(_RUNNER_MJS)
            with open(os.path.join(d, "module.mjs"), "w") as f:
                f.write(self.script)
            _MATERIALIZED[key] = d
        return os.path.join(d, "runner.mjs"), os.path.join(d, "module.mjs")

    def batch(self, payloads: list) -> list[tuple[object, str | None]]:
        """Run the function over a batch: one (value, error) per input.
        A ``str`` payload is passed to JS as a string value; any other
        object is passed as the parsed JSON structure."""
        if not payloads:
            return []
        node = shutil.which("node")
        if node is None:
            raise RuntimeError("node executable not found on PATH")
        runner, module = self._materialize()
        argv = [node, "--no-warnings"]
        if self.sandbox:
            argv += [
                "--experimental-permission",
                f"--allow-fs-read={os.path.dirname(runner)}",
            ]
        argv += [runner, module, self.function]
        stdin = "\n".join(
            json.dumps(p, separators=(",", ":"), ensure_ascii=False)
            for p in payloads
        )
        proc = subprocess.run(
            argv,
            input=stdin,
            capture_output=True,
            text=True,
            timeout=self.timeout,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"js module {self.module_id or self.function!r} failed: "
                f"{proc.stderr.strip() or proc.returncode}"
            )
        out = []
        for line in proc.stdout.splitlines():
            if not line.strip():
                continue
            rec = json.loads(line)
            if "err" in rec:
                out.append((None, rec["err"]))
            else:
                out.append((rec["ok"], None))
        if len(out) != len(payloads):
            raise RuntimeError(
                f"js module {self.module_id or self.function!r}: "
                f"{len(payloads)} inputs but {len(out)} outputs"
            )
        return out

    def __call__(self, payload):
        value, err = self.batch([payload])[0]
        if err is not None:
            raise RuntimeError(err)
        return value
