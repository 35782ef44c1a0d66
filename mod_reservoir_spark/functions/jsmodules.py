"""Real JavaScript code-module execution via a Node.js subprocess.

The reference embeds GraalVM polyglot JS in the server JVM
(server/.../module/impl/ModuleJavaScript.java:30-105) and resolves
``module::function`` invocations against ES-module exports. On Spark,
executors run Python workers, so the equivalent seam is a LONG-LIVED
node worker per (process, module): the module source ships inside the
picklable function object, is materialized once per worker process to
a private temp dir, and a fixed runner script streams JSON-line
payloads through the exported function — one subprocess per
(executor-process, module), reused across Arrow batches, so the ~60 ms
node startup is paid once per executor instead of once per batch.

Sandboxing (parity with GraalVM's default-deny polyglot Context,
ModuleJavaScript.java:30-105):

- Filesystem: node's permission model (``--experimental-permission``)
  confines reads to the module's temp dir and denies writes and child
  processes.
- Network egress: node 20's permission model does NOT cover the
  network, so the worker is additionally launched inside an EMPTY
  network namespace (``unshare -n`` — kernel-level: no interfaces, no
  DNS, nothing to connect to) whenever the host supports it, probed
  once per process.  Where netns is unavailable (unprivileged
  container), the runner falls back to neutering the network APIs
  in-process before the tenant module is imported (fetch, net/tls
  socket connect, dgram send, http/https agents, and — r5 — every
  dns resolver entry point: callback, promises and Resolver APIs,
  the query-name exfiltration channel c-ares/getaddrinfo open even
  with sockets denied). Best-effort: a module reaching into node
  internals could still bypass an in-process shim, so deployments
  should prefer hosts where ``unshare -n`` works (kernel-level).

Invocation contract mirrors ModuleJavaScript — the input is always
passed ENCODED as a JSON string (``input.encode()``,
ModuleJavaScript.java:104,120), so tenant modules written for the
reference (which call ``JSON.parse(record)`` themselves) run
unmodified:
- matcher: ``matchkey(recordStr)`` → string | array of strings
  (executeAsCollection, ModuleJavaScript.java:119-146)
- transformer: ``transform(clusterStr)`` → JSON string
  (execute, ModuleJavaScript.java:103-116)

Protocol: one JSON line in → one JSON line out per record
(``{"ok": v}`` / ``{"err": msg}``); the worker announces
``{"ready": true}`` after importing the module, or ``{"fatal": msg}``
and exits if the import / export lookup fails, so module errors
surface at spawn rather than hanging the first batch.
"""

from __future__ import annotations

import atexit
import hashlib
import json
import os
import select
import shutil
import subprocess
import tempfile
import threading
import time

_RUNNER_MJS = """
import { pathToFileURL } from 'url';
import { createInterface } from 'readline';
const [modPath, fnName] = process.argv.slice(2);
if (process.env.JSMOD_BLOCK_NET === '1') {
  // In-process egress neutering — fallback for hosts without netns
  // support (when available the worker also runs under `unshare -n`,
  // which blocks everything at the kernel).  Patch the constructors /
  // prototypes the builtin networking entry points all funnel through,
  // BEFORE the tenant module is imported.
  const deny = (name) => function () {
    throw new Error('network egress denied: ' + name);
  };
  globalThis.fetch = deny('fetch');
  try {
    const net = await import('node:net');
    net.Socket.prototype.connect = deny('net.connect');
  } catch {}
  try {
    const tls = await import('node:tls');
    if (tls.TLSSocket) tls.TLSSocket.prototype.connect = deny('tls.connect');
  } catch {}
  try {
    const dgram = await import('node:dgram');
    dgram.Socket.prototype.send = deny('dgram.send');
    dgram.Socket.prototype.connect = deny('dgram.connect');
  } catch {}
  try {
    const http = await import('node:http');
    http.Agent.prototype.createConnection = deny('http.connect');
  } catch {}
  try {
    const https = await import('node:https');
    https.Agent.prototype.createConnection = deny('https.connect');
  } catch {}
  try {
    // DNS is its own exfiltration channel: dns.resolve* goes through
    // c-ares (not dgram), dns.lookup through getaddrinfo — both can
    // smuggle data in query names even with sockets denied.  The ESM
    // namespace is frozen, but node builtins are CJS-backed and the
    // ESM bindings are LIVE views of the (mutable) CJS exports — so
    // patch through createRequire and both import styles see it.
    const { createRequire } = await import('node:module');
    const req = createRequire(import.meta.url);
    const dnsCjs = req('node:dns');
    for (const k of Object.keys(dnsCjs)) {
      if (typeof dnsCjs[k] === 'function'
          && /^(lookup|resolve|reverse)/.test(k)) {
        dnsCjs[k] = deny('dns.' + k);
      }
    }
    const dp = req('node:dns/promises');
    for (const k of Object.keys(dp)) {
      if (typeof dp[k] === 'function'
          && /^(lookup|resolve|reverse)/.test(k)) {
        dp[k] = deny('dns.promises.' + k);
      }
    }
    // dns.promises is a getter-only accessor on some node versions —
    // a bare assignment throws in strict mode and would abort the
    // Resolver sweep below
    try {
      Object.defineProperty(dnsCjs, 'promises', {
        value: dp, configurable: true,
      });
    } catch {}
    // Resolver methods may be non-writable / defined up the prototype
    // chain — force-define per property and never let one failure
    // abort the rest of the sweep
    const nuke = (obj, label) => {
      for (let p = obj; p && p !== Object.prototype;
           p = Object.getPrototypeOf(p)) {
        for (const k of Object.getOwnPropertyNames(p)) {
          if (!/^(lookup|resolve|reverse)/.test(k)) continue;
          try {
            Object.defineProperty(p, k, {
              value: deny(label + '.' + k), configurable: true,
            });
          } catch {}
        }
      }
    };
    for (const R of [dnsCjs.Resolver, dp.Resolver]) {
      if (R) nuke(R.prototype, 'dns.Resolver');
    }
  } catch {}
}
let mod;
try {
  mod = await import(pathToFileURL(modPath));
} catch (e) {
  process.stdout.write(JSON.stringify(
    { fatal: 'import failed: ' + String((e && e.message) || e) }) + '\\n');
  process.exit(2);
}
const fn = mod[fnName || 'matchkey'] ?? mod.default;
if (typeof fn !== 'function') {
  process.stdout.write(JSON.stringify(
    { fatal: 'module has no function ' + fnName }) + '\\n');
  process.exit(2);
}
process.stdout.write('{"ready":true}\\n');
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

# per-process caches: script sha -> materialized dir; worker key -> worker
_MATERIALIZED: dict[str, str] = {}
_WORKERS: dict[str, "_NodeWorker"] = {}
# guards _WORKERS lookup/insert/evict — without it two threads batching
# the same module can both spawn, leaking the overwritten node process
_WORKERS_LOCK = threading.Lock()
_UNSHARE_NET: bool | None = None
_SANDBOX_MODE_WARNED = False


def node_available() -> bool:
    return shutil.which("node") is not None


def sandbox_mode() -> str:
    """Which network-egress block sandboxed workers on THIS process
    get: ``"netns"`` (empty network namespace — kernel-level, covers
    everything incl. DNS) or ``"in-process"`` (API neutering — does
    NOT cover DNS-resolver exfiltration). Queryable so a deployment
    can alert instead of silently running the weaker mode."""
    return "netns" if _unshare_net_available() else "in-process"


def _warn_weak_sandbox() -> None:
    """Once per process (= once per executor): the netns probe failed,
    so sandboxed JS modules fall back to in-process API neutering."""
    global _SANDBOX_MODE_WARNED
    if _SANDBOX_MODE_WARNED:
        return
    _SANDBOX_MODE_WARNED = True
    import logging

    logging.getLogger(__name__).warning(
        "JS sandbox: `unshare -n` unavailable on this host — network "
        "egress for code modules is blocked by in-process API "
        "neutering only, which does not cover DNS-resolver "
        "exfiltration. Prefer hosts where empty network namespaces "
        "can be created (root / CAP_SYS_ADMIN)."
    )


def _unshare_net_available() -> bool:
    """Probe once whether an empty network namespace can be entered
    (root / CAP_SYS_ADMIN; the strongest egress block available)."""
    global _UNSHARE_NET
    if _UNSHARE_NET is None:
        unshare = shutil.which("unshare")
        if unshare is None:
            _UNSHARE_NET = False
        else:
            try:
                _UNSHARE_NET = (
                    subprocess.run(
                        [unshare, "-n", "true"],
                        capture_output=True,
                        timeout=10,
                    ).returncode
                    == 0
                )
            except (OSError, subprocess.TimeoutExpired):
                _UNSHARE_NET = False
    return _UNSHARE_NET


@atexit.register
def _shutdown_workers() -> None:
    for w in list(_WORKERS.values()):
        w.kill()
    _WORKERS.clear()
    for d in _MATERIALIZED.values():
        shutil.rmtree(d, ignore_errors=True)
    _MATERIALIZED.clear()


class _NodeWorker:
    """One long-lived node subprocess speaking the line protocol.

    stderr goes to a file in the materialized dir (a pipe would
    deadlock if a chatty module filled it); stdout is read with a
    deadline via select on the raw fd."""

    def __init__(self, argv: list[str], env: dict, stderr_path: str):
        self.stderr_path = stderr_path
        self._stderr_file = open(stderr_path, "ab")
        self.proc = subprocess.Popen(
            argv,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=self._stderr_file,
            env=env,
        )
        self.buf = bytearray()
        self.lock = threading.Lock()

    def stderr_tail(self, limit: int = 2000) -> str:
        try:
            self._stderr_file.flush()
            with open(self.stderr_path, "rb") as f:
                data = f.read()
            return data[-limit:].decode("utf-8", "replace").strip()
        except OSError:
            return ""

    def read_line(self, deadline: float) -> str:
        fd = self.proc.stdout.fileno()
        while True:
            nl = self.buf.find(b"\n")
            if nl >= 0:
                line = bytes(self.buf[:nl])
                del self.buf[: nl + 1]
                return line.decode("utf-8", "replace")
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                raise TimeoutError("js module timed out")
            ready, _, _ = select.select([fd], [], [], timeout)
            if not ready:
                raise TimeoutError("js module timed out")
            chunk = os.read(fd, 65536)
            if not chunk:
                raise BrokenPipeError(
                    f"js worker exited: {self.stderr_tail() or 'no stderr'}"
                )
            self.buf += chunk

    def kill(self) -> None:
        try:
            self.proc.kill()
            self.proc.wait(timeout=5)
        except (OSError, subprocess.TimeoutExpired):
            pass
        try:
            self._stderr_file.close()
        except OSError:
            pass


class JsModuleFunction:
    """A payload→value function backed by an ES-module export, executed
    in a sandboxed long-lived node worker. Picklable (carries the
    source text); also exposes ``batch`` so Arrow-batched callers
    stream the whole batch through one worker round-trip."""

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

    def _worker_key(self) -> str:
        sha = hashlib.sha256(self.script.encode()).hexdigest()
        return f"{sha}:{self.function}:{int(self.sandbox)}"

    def _spawn(self) -> _NodeWorker:
        node = shutil.which("node")
        if node is None:
            raise RuntimeError("node executable not found on PATH")
        runner, module = self._materialize()
        argv = [node, "--no-warnings"]
        env = dict(os.environ)
        if self.sandbox:
            argv += [
                "--experimental-permission",
                f"--allow-fs-read={os.path.dirname(runner)}",
            ]
            env["JSMOD_BLOCK_NET"] = "1"
            if _unshare_net_available():
                argv = [shutil.which("unshare"), "-n"] + argv
            else:
                _warn_weak_sandbox()
        else:
            env["JSMOD_BLOCK_NET"] = "0"
        argv += [runner, module, self.function]
        worker = _NodeWorker(
            argv, env, os.path.join(os.path.dirname(runner), "stderr.log")
        )
        # handshake: module import + export resolution happen at spawn
        try:
            first = json.loads(
                worker.read_line(time.monotonic() + self.timeout)
            )
        except (BrokenPipeError, TimeoutError, ValueError) as e:
            worker.kill()
            raise RuntimeError(
                f"js module {self.module_id or self.function!r} failed: {e}"
            ) from None
        if not first.get("ready"):
            worker.kill()
            raise RuntimeError(
                f"js module {self.module_id or self.function!r} failed: "
                f"{first.get('fatal') or first}"
            )
        return worker

    def _get_worker(self) -> _NodeWorker:
        key = self._worker_key()
        with _WORKERS_LOCK:
            w = _WORKERS.get(key)
            if w is None or w.proc.poll() is not None:
                if w is not None:
                    w.kill()
                w = self._spawn()
                _WORKERS[key] = w
        return w

    def _evict(self, worker: _NodeWorker) -> None:
        key = self._worker_key()
        with _WORKERS_LOCK:
            if _WORKERS.get(key) is worker:
                del _WORKERS[key]
        worker.kill()

    def batch(self, payloads: list) -> list[tuple[object, str | None]]:
        """Run the function over a batch: one (value, error) per input.
        A ``str`` payload is passed to JS as a string value; any other
        object is passed as the parsed JSON structure."""
        if not payloads:
            return []
        stdin = (
            "\n".join(
                json.dumps(p, separators=(",", ":"), ensure_ascii=False)
                for p in payloads
            )
            + "\n"
        ).encode()
        last_err: Exception | None = None
        for attempt in range(2):  # one respawn if a cached worker died
            worker = self._get_worker()
            deadline = time.monotonic() + self.timeout
            write_exc: list[Exception] = []

            def _write(w=worker, exc=write_exc):
                # writer thread: interleaves with reads so a batch larger
                # than the pipe buffers cannot deadlock both sides
                try:
                    w.proc.stdin.write(stdin)
                    w.proc.stdin.flush()
                except OSError as e:
                    exc.append(e)

            with worker.lock:
                t = threading.Thread(target=_write, daemon=True)
                t.start()
                try:
                    lines = [
                        worker.read_line(deadline) for _ in payloads
                    ]
                except BrokenPipeError as e:
                    self._evict(worker)
                    last_err = e
                    continue
                except TimeoutError:
                    self._evict(worker)
                    raise RuntimeError(
                        f"js module {self.module_id or self.function!r} "
                        f"timed out after {self.timeout}s"
                    ) from None
                finally:
                    t.join(timeout=5)
            if write_exc and len(lines) != len(payloads):
                self._evict(worker)
                last_err = write_exc[0]
                continue
            out: list[tuple[object, str | None]] = []
            for line in lines:
                rec = json.loads(line)
                if "err" in rec:
                    out.append((None, rec["err"]))
                else:
                    out.append((rec["ok"], None))
            return out
        raise RuntimeError(
            f"js module {self.module_id or self.function!r} failed: "
            f"{last_err}"
        )

    def __call__(self, payload):
        value, err = self.batch([payload])[0]
        if err is not None:
            raise RuntimeError(err)
        return value
