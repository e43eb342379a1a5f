"""Disk cache of ``jax.export`` program artifacts: cross-process AOT reuse.

The persistent XLA compilation cache only skips the *backend compile*; a
fresh process still pays Python tracing + jaxpr->MLIR lowering for every
program (measured 5-8 s for the big phase programs on the benchmark, i.e.
most of the "compile tax" the round-2 verdict flagged). ``jax.export``
serializes the lowered StableHLO module itself, so a later process skips
tracing and lowering entirely and goes straight to the (persistently
cached) backend compile: deserialize + first call measured ~0.8 s where
the jit path cost 5-13 s.

Correctness contract. An exported artifact embeds every closure constant
(observed image, PSF/DFT factors, prior parameters) as module constants,
so a stale artifact is silently WRONG, not slow. The cache key therefore
hashes, conservatively:

* the full source of the ``gigalens_tpu`` package (any code change
  invalidates everything),
* jax/jaxlib versions and the target platform,
* the caller-supplied ``static_desc`` — the caller MUST fold in a
  fingerprint of all data the traced function closes over (see
  ``ModellingSequence._aot_desc``: prob-model arrays, prior spec, config),
* the argument shape/dtype/pytree signature.

Anything not captured by those (e.g. out-of-package monkeypatching) is on
the caller; set ``GIGALENS_AOT_CACHE=0`` to fall back to plain jit.

Serialized EXECUTABLES (the ``.jaxexec`` tier) additionally bake in
host-specific state — XLA:CPU AOT code for this machine's CPU features and
the loading runtime's version — so their filenames carry
:func:`host_fingerprint` and they are only ever loaded from the local
working cache, never from the git-tracked store (which would also mean
unpickling unreviewable binary blobs from the repo). Even then the key
cannot be *proven* exhaustive, so the first call through a deserialized
executable is a synchronous canary (``_guarded_compiled``): any fault falls
back to a fresh backend compile of the portable export. The round-4
benchmark crash (BASELINE.md) is the motivating incident: the working tree
persists across rounds while the host machine changes, so a gitignored
cache directory is NOT host-private.

Enabled by default only on single-device TPU processes (the benchmark
environment); multi-device meshes keep the plain jit path (export pins
shardings, and the CPU dryrun fabricates device counts per process).
"""
from __future__ import annotations

import functools
import hashlib
import logging
import os
import pathlib

import jax
import numpy as np

log = logging.getLogger(__name__)

_SENTINEL = object()

# in-process record of every cache resolution: (program name, "hit" |
# "miss" | "load-failed" | "export-failed" | "disabled", seconds spent
# resolving). bench.py surfaces this so a driver log shows exactly which
# phase programs were served from disk and which paid trace+lower.
events: list = []


def drain_events():
    """Return and clear the resolution event log."""
    out = list(events)
    events.clear()
    return out


@functools.lru_cache(maxsize=1)
def host_fingerprint() -> str:
    """Fingerprint of everything host-specific a compiled EXECUTABLE bakes in.

    A serialized executable (tier 1, and the XLA persistent compilation
    cache) embeds XLA:CPU AOT code compiled for THIS machine's CPU features;
    loading it on a host with a different feature set is at best a loud
    warning and at worst SIGILL (observed: the round-4 driver benchmark —
    the repo's working tree persists across rounds while the host machine
    changes, so a gitignored cache is NOT host-private). StableHLO exports
    (tier 2) are host-portable and do NOT include this fingerprint.

    Covers: CPU feature flags (/proc/cpuinfo), platform, jaxlib and libtpu
    versions (the runtime that loads the executable), and compile-affecting
    configuration (XLA_FLAGS, x64, default matmul precision).
    """
    import platform

    h = hashlib.sha256()
    try:
        for line in pathlib.Path("/proc/cpuinfo").read_text().splitlines():
            if line.startswith("flags"):
                h.update(" ".join(sorted(line.split()[2:])).encode())
                break
    except OSError:
        h.update(platform.processor().encode())
    h.update(platform.machine().encode())
    h.update(platform.system().encode())
    import importlib.metadata as _im

    for dist in ("jaxlib", "libtpu", "libtpu-nightly"):
        try:
            h.update(f"{dist}={_im.version(dist)}".encode())
        except Exception:
            h.update(f"{dist}=?".encode())
    h.update(os.environ.get("XLA_FLAGS", "").encode())
    h.update(str(jax.config.jax_enable_x64).encode())
    h.update(str(jax.config.jax_default_matmul_precision).encode())
    return h.hexdigest()[:16]


@functools.lru_cache(maxsize=1)
def package_fingerprint() -> str:
    """Content hash of every .py file in the installed gigalens_tpu package."""
    import gigalens_tpu

    root = pathlib.Path(gigalens_tpu.__file__).parent
    h = hashlib.sha256()
    for p in sorted(root.rglob("*.py")):
        h.update(str(p.relative_to(root)).encode())
        h.update(p.read_bytes())
    return h.hexdigest()


def cache_base() -> pathlib.Path:
    default = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
    return pathlib.Path(os.environ.get("GIGALENS_JAX_CACHE", str(default)))


def cache_dir() -> pathlib.Path:
    return cache_base() / "export"


def setup_compilation_cache(base=None) -> pathlib.Path:
    """Enable the persistent XLA compilation cache, segregated per host.

    XLA cache entries embed XLA:CPU AOT host code compiled for the caching
    machine's CPU features — the same hazard as the ``.jaxexec`` tier (and
    part of the same round-4 incident: ``cpu_aot_loader`` served
    feature-mismatched code to a different host sharing the filesystem).
    The directory is suffixed with :func:`host_fingerprint` so a different
    machine starts cold instead of loading incompatible code.

    Also sets ``jax_persistent_cache_min_compile_time_secs=0``: on the axon
    tunnel even a trivial op pays a ~0.4 s remote-compile round trip, and a
    pipeline run dispatches dozens of small utility programs — persisting
    them all turns that tax into ~ms disk hits on reruns.
    """
    path = pathlib.Path(base) if base else cache_base()
    path = path / ("xla-" + host_fingerprint()[:12])
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as e:  # pragma: no cover - older jax without the flags
        log.warning("persistent compilation cache unavailable: %s", e)
    return path


def store_dir() -> pathlib.Path:
    """Git-tracked artifact store, the read-only second lookup tier.

    ``cache_dir`` lives under ``.jax_cache/`` which is gitignored, so a
    fresh clone always starts cold. Artifacts published here
    (``scripts/publish_aot.py``) ship with the repo. Trust model: the store
    serves ONLY ``.jaxexport`` StableHLO modules — host-portable, no pickle,
    deserialized by jax.export's versioned format — never ``.jaxexec``
    executables (pickle blobs; see :func:`_lookup`). The content-addressed
    keys (package hash + jax/jaxlib versions + platform + data
    fingerprints) make a stale hit *unlikely*, not impossible — anything
    the key does not capture (e.g. out-of-package monkeypatching) is on
    the publisher, which is why the executable tier gets the stronger
    host-fingerprint + canary treatment.
    """
    default = pathlib.Path(__file__).resolve().parents[2] / "aot_store"
    return pathlib.Path(os.environ.get("GIGALENS_AOT_STORE", str(default)))


def _lookup(filename: str, cache_only: bool = False):
    """Return the first existing artifact path among the lookup tiers.

    ``cache_only`` restricts the search to the working cache — used for
    ``.jaxexec`` executables, which are (a) pickle blobs (loading one from
    the git-tracked store would execute unreviewable binary content) and
    (b) host-specific (see :func:`host_fingerprint`). Only portable,
    pickle-free StableHLO exports are ever served from the store tier.
    """
    tiers = (cache_dir(),) if cache_only else (cache_dir(), store_dir())
    for base in tiers:
        p = base / filename
        if p.exists():
            return p
    return None


def enabled() -> bool:
    flag = os.environ.get("GIGALENS_AOT_CACHE", "1")
    if flag == "0":
        return False
    if flag == "force":  # tests: exercise the cache on any backend
        return True
    try:
        return jax.default_backend() == "tpu" and jax.device_count() == 1
    except Exception:
        return False


def array_fingerprint(*arrays) -> str:
    """Cheap stable hash of numpy/jax array contents (for static_desc)."""
    h = hashlib.sha256()
    for a in arrays:
        if a is None:
            h.update(b"none")
            continue
        a = np.asarray(a)
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(a.tobytes())
    return h.hexdigest()[:16]


_registered_namedtuples = set()


def _register_namedtuple(dotted: str):
    """Register ``module.Qualname`` for jax.export pytree serialization."""
    if dotted in _registered_namedtuples:
        return
    from jax import export as jexport
    import importlib

    module, _, qual = dotted.rpartition(".")
    obj = importlib.import_module(module)
    for part in qual.split("."):
        obj = getattr(obj, part)
    try:
        jexport.register_namedtuple_serialization(obj, serialized_name=dotted)
    except ValueError as e:
        if "already registered" not in str(e):
            raise
    _registered_namedtuples.add(dotted)


_UNREGISTERED_RE = (
    r"unregistered type `<class '([\w\.]+)'>`",
    r"Cannot deserialize a serialized custom type `([\w\.]+)`",
    r"serialized name `([\w\.]+)` is not registered",
)


def _retrying_registration(thunk, max_tries: int = 64):
    """Run thunk, registering NamedTuple pytree types it complains about.

    jax.export requires every custom pytree node (our HMC adaptation states,
    optax optimizer states, ...) to be registered for serialization by a
    stable name. Rather than hard-coding the closed set, parse the error,
    import the named class, register it under its dotted path (importable
    from any process), and retry. Non-namedtuple custom pytrees still fail
    and fall back to plain jit in the caller."""
    import re

    for _ in range(max_tries):
        try:
            return thunk()
        except Exception as e:
            msg = str(e)
            for pat in _UNREGISTERED_RE:
                m = re.search(pat, msg)
                if m:
                    _register_namedtuple(m.group(1))
                    break
            else:
                raise
    raise ValueError("aot: too many unregistered pytree types")


def _arg_signature(args) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(args)
    sig = [f"{jax.numpy.shape(x)}/{jax.numpy.result_type(x)}" for x in leaves]
    return f"{treedef}|{';'.join(sig)}"


class AOTProgram:
    """A jit-compatible callable backed by the export disk cache.

    First call resolves the artifact for the concrete argument signature:
    loads and wraps a serialized module if present, else traces/lowers the
    wrapped function, serializes it, and uses the plain jit path for this
    process. One AOTProgram supports one argument signature at a time
    (phase programs have fixed shapes per configuration); a new signature
    re-resolves.
    """

    def __init__(self, name: str, fn, static_desc: str = "", enable=None):
        self.name = name
        self.fn = fn
        self.static_desc = static_desc
        self.enable = enabled() if enable is None else enable
        self._callables = {}  # arg signature -> callable

    def _key(self, args) -> str:
        """Portability-tier key: everything a StableHLO EXPORT depends on.

        Host-specific state (CPU features, libtpu/runtime versions, compile
        flags) is deliberately NOT here — exports are host-portable; the
        executable tier appends :func:`host_fingerprint` to its filename.
        """
        import importlib.metadata as _im

        try:
            jaxlib_ver = _im.version("jaxlib")
        except Exception:  # pragma: no cover - jaxlib always installed
            jaxlib_ver = getattr(jax.lib, "__version__", "")
        h = hashlib.sha256()
        for part in (
            self.name,
            self.static_desc,
            package_fingerprint(),
            jax.__version__,
            jaxlib_ver,
            jax.default_backend(),
            str(jax.devices()[0].device_kind),
            _arg_signature(args),
        ):
            h.update(str(part).encode())
            h.update(b"\0")
        return h.hexdigest()

    def _resolve(self, args, skip_exec: bool = False):
        import pickle
        import time as _time

        t0 = _time.time()
        if not self.enable:
            events.append((self.name, "disabled", 0.0))
            return jax.jit(self.fn)
        from jax import export as jexport

        key = self._key(args)
        exec_enabled = (not skip_exec and
                        os.environ.get("GIGALENS_AOT_EXEC", "1") != "0")

        # --- tier 1: serialized compiled executable --------------------
        # skips Python tracing, lowering, AND the backend compile (on the
        # axon tunnel the backend compile is a multi-second remote RPC per
        # program and the persistent XLA cache does not cover it).
        # Working-cache only (never the git-tracked store: pickle), and the
        # filename carries the host fingerprint — an executable compiled on
        # a machine with different CPU features / runtime versions is
        # unreachable, not merely warned about (round-4 crash root cause).
        exec_path = exec_enabled and _lookup(
            f"{self.name}-{key}-{host_fingerprint()}.jaxexec", cache_only=True)
        if exec_path:
            try:
                from jax.experimental import serialize_executable as se

                payload = pickle.loads(exec_path.read_bytes())
                # single-device contract: load against device 0 only — with
                # the backend's full device list a multi-device process
                # would build an N-device DeviceList and then demand
                # N-sharded arguments for this 1-replica program
                compiled = se.deserialize_and_load(
                    *payload, execution_devices=jax.devices()[:1])
                log.debug("aot: loaded executable %s", exec_path.name)
                events.append(
                    (self.name, "exec-hit", round(_time.time() - t0, 3)))
                # canary contract: the first call through the guard is made
                # synchronous, and any fault falls back to tier 2 (a fresh
                # backend compile of the exported module) — a deserialized
                # executable is never trusted with a whole phase sight-unseen
                return _guarded_compiled(
                    compiled, self.fn,
                    fallback=lambda: self._resolve(args, skip_exec=True))
            except Exception as e:  # plugin lacks support, version skew, ...
                log.warning("aot: failed to load executable %s (%s)",
                            exec_path.name, e)
                events.append(
                    (self.name, "exec-load-failed",
                     round(_time.time() - t0, 3)))

        # --- tier 2: exported StableHLO module -------------------------
        # skips tracing + lowering (5-15 s for the phase programs); the
        # backend compile still runs (persistently cached where supported)
        exp = None
        status = None
        path = _lookup(f"{self.name}-{key}.jaxexport")
        if path:
            try:
                exp = _retrying_registration(
                    lambda: jexport.deserialize(path.read_bytes())
                )
                log.debug("aot: loaded %s", path.name)
                status = "hit"
            except Exception as e:  # version skew, corrupt file, ...
                log.warning("aot: failed to load %s (%s); re-exporting",
                            path.name, e)
                events.append(
                    (self.name, "load-failed", round(_time.time() - t0, 3))
                )
        specs = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                jax.numpy.shape(x), jax.numpy.result_type(x)
            ),
            args,
        )
        if exp is None:
            # --- tier 3: trace + lower + export ------------------------
            jfn = jax.jit(self.fn)
            try:
                exp = _retrying_registration(lambda: jexport.export(jfn)(*specs))
                data = _retrying_registration(exp.serialize)
                wpath = cache_dir() / f"{self.name}-{key}.jaxexport"
                wpath.parent.mkdir(parents=True, exist_ok=True)
                tmp = wpath.with_suffix(".tmp")
                tmp.write_bytes(data)
                os.replace(tmp, wpath)
                log.debug("aot: exported %s (%.1f MB)", wpath.name,
                          len(data) / 1e6)
                status = "miss"
            except Exception as e:
                log.warning("aot: export of %s failed (%s); plain jit",
                            self.name, e)
                events.append(
                    (self.name, "export-failed", round(_time.time() - t0, 3))
                )
                return jfn
        events.append((self.name, status, round(_time.time() - t0, 3)))

        # call through the exported module — retracing via the plain jit
        # path would pay Python tracing + lowering a second time (measured
        # 5-15 s for the phase programs, the bulk of round 3's +15 s SVI
        # regression on a cold export cache)
        call_fn = jax.jit(exp.call)
        if exec_enabled:
            # opportunistically compile now (the first call would anyway)
            # and serialize the executable so the NEXT process on THIS host
            # skips the backend compile too
            compiled = None
            try:
                compiled = call_fn.lower(*specs).compile()
            except Exception as e:
                log.warning("aot: AOT compile of %s failed (%s)",
                            self.name, e)
                events.append(
                    (self.name, "exec-export-failed",
                     round(_time.time() - t0, 3)))
            if compiled is not None:
                # serialize/write failure must not discard the finished
                # compile: jit dispatch would pay the backend compile again
                try:
                    from jax.experimental import serialize_executable as se

                    payload = se.serialize(compiled)
                    wpath = cache_dir() / (
                        f"{self.name}-{key}-{host_fingerprint()}.jaxexec")
                    wpath.parent.mkdir(parents=True, exist_ok=True)
                    tmp = wpath.with_suffix(".etmp")
                    tmp.write_bytes(pickle.dumps(payload))
                    os.replace(tmp, wpath)
                    log.debug("aot: wrote executable %s", wpath.name)
                except Exception as e:
                    log.warning(
                        "aot: executable serialization of %s unavailable (%s)",
                        self.name, e)
                    events.append(
                        (self.name, "exec-export-failed",
                         round(_time.time() - t0, 3)))
                return _guarded_compiled(compiled, self.fn,
                                         fallback=lambda: call_fn)
        return call_fn

    def __call__(self, *args):
        sig = _arg_signature(args)
        fn = self._callables.get(sig)
        if fn is None:
            fn = self._callables[sig] = self._resolve(args)
        return fn(*args)


def _guarded_compiled(compiled, fn, fallback=None):
    """Call an AOT ``Compiled`` with a synchronous first-call canary.

    A Compiled is strict about argument avals (no weak-type promotion, no
    re-canonicalization), and a deserialized executable can additionally
    fault the DEVICE at run time (e.g. host-incompatible embedded CPU code —
    the round-4 benchmark crash). Device faults surface *asynchronously* at
    a later ``block_until_ready``, past any try/except here — so the first
    call blocks on its results before they are released. After one clean
    synchronous call the guard gets out of the way.

    ``fallback`` is a zero-arg factory for the recovery path (tier-2
    re-resolve for loaded executables, the already-jitted export call for
    freshly compiled ones); plain ``jax.jit(fn)`` — a full retrace — is the
    last resort.
    """
    state = {"ok": False, "fallback": None}

    def call(*args):
        if state["fallback"] is not None:
            return state["fallback"](*args)
        if state["ok"]:
            return compiled(*args)
        try:
            out = compiled(*args)
            jax.block_until_ready(out)  # canary: surface async device faults
            state["ok"] = True
            return out
        except Exception as e:
            log.warning("aot: compiled first call failed (%s); falling back",
                        e)
            events.append(("<compiled>", "exec-call-failed", 0.0))
            state["fallback"] = (fallback() if fallback is not None
                                 else jax.jit(fn))
            return state["fallback"](*args)

    return call


def _fp_update(h, obj, seen, depth=0):
    """Recursive structural/content hash for data_fingerprint."""
    if depth > 32:
        raise ValueError("data_fingerprint: structure too deep")
    if obj is None or isinstance(obj, (bool, int, float, complex, str, bytes)):
        h.update(repr(obj).encode())
        return
    oid = id(obj)
    if oid in seen:
        h.update(b"<cycle>")
        return
    seen.add(oid)
    if isinstance(obj, jax.tree_util.PyTreeDef):
        # str(PyTreeDef) is a stable structural description; np.asarray on
        # one silently builds a 0-d OBJECT array whose tobytes() is a raw
        # per-process pointer — that poisoned every phase program's cache
        # key with fresh-process noise (observed: map_seg/svi_seg/hmc_seg
        # missed on every benchmark run)
        h.update(str(obj).encode())
        return
    if isinstance(obj, (np.ndarray, np.generic)) or hasattr(obj, "__jax_array__") \
            or type(obj).__module__.startswith("jax"):
        try:
            a = np.asarray(obj)
            if a.dtype.hasobject:
                raise TypeError("object array is not content-hashable")
            h.update(str(a.shape).encode())
            h.update(str(a.dtype).encode())
            h.update(a.tobytes())
            return
        except Exception:
            pass
    if isinstance(obj, dict):
        h.update(b"{")
        for k in sorted(obj, key=repr):
            h.update(repr(k).encode())
            _fp_update(h, obj[k], seen, depth + 1)
        h.update(b"}")
        return
    if isinstance(obj, (list, tuple)):
        h.update(b"[")
        for v in obj:
            _fp_update(h, v, seen, depth + 1)
        h.update(b"]")
        return
    import types

    if isinstance(obj, types.ModuleType):
        h.update(f"<mod:{obj.__name__}>".encode())
        return
    if isinstance(obj, type):
        h.update(f"<class:{obj.__module__}.{obj.__qualname__}>".encode())
        return
    import functools as _ft

    if isinstance(obj, _ft.partial):
        h.update(b"<partial>")
        _fp_update(h, obj.func, seen, depth + 1)
        _fp_update(h, obj.args, seen, depth + 1)
        _fp_update(h, obj.keywords, seen, depth + 1)
        return
    if isinstance(obj, (types.FunctionType, types.MethodType,
                        types.BuiltinFunctionType)) or (
            callable(obj) and not hasattr(obj, "__dict__")):
        # Function identity + every closure cell + defaults: this is what
        # captures e.g. an optax schedule's learning-rate constants — two
        # optimizers built from the same code but different hyperparameters
        # MUST fingerprint differently (code itself is covered by the
        # package fingerprint / the function's qualname).
        h.update(b"<fn:")
        h.update(getattr(obj, "__module__", "") .__str__().encode())
        h.update(getattr(obj, "__qualname__",
                         type(obj).__qualname__).encode())
        if getattr(obj, "__self__", None) is not None:
            _fp_update(h, obj.__self__, seen, depth + 1)
        for cell in getattr(obj, "__closure__", None) or ():
            try:
                contents = cell.cell_contents
            except ValueError:  # empty cell
                h.update(b"<empty>")
                continue
            _fp_update(h, contents, seen, depth + 1)
        for dv in getattr(obj, "__defaults__", None) or ():
            _fp_update(h, dv, seen, depth + 1)
        h.update(b">")
        return
    import dataclasses

    if dataclasses.is_dataclass(obj):
        h.update(type(obj).__qualname__.encode())
        for f in dataclasses.fields(obj):
            h.update(f.name.encode())
            _fp_update(h, getattr(obj, f.name), seen, depth + 1)
        return
    if hasattr(obj, "__dict__"):
        # generic object: class identity + instance state; bound methods /
        # jitted closures are skipped (their code is package-fingerprinted)
        h.update(type(obj).__qualname__.encode())
        for k in sorted(vars(obj)):
            v = vars(obj)[k]
            if callable(v) and not isinstance(v, (np.ndarray,)):
                h.update(f"<callable:{k}>".encode())
                continue
            h.update(k.encode())
            _fp_update(h, v, seen, depth + 1)
        return
    raise ValueError(
        f"data_fingerprint: cannot hash {type(obj).__qualname__}"
    )


def data_fingerprint(*objs) -> str:
    """Content hash of model/simulator object graphs for AOT cache keys.

    Walks arrays, scalars, containers, dataclasses, and plain objects
    (class name + instance ``__dict__``); skips callables (code changes are
    covered by :func:`package_fingerprint`). Raises ``ValueError`` on
    unhashable structure — callers treat that as "AOT unavailable", never
    as "reuse anyway".
    """
    h = hashlib.sha256()
    seen = set()
    for o in objs:
        _fp_update(h, o, seen)
        h.update(b"\0")
    return h.hexdigest()[:24]


def aot_jit(name: str, fn=None, *, static_desc: str = "", enable=None):
    """``aot_jit("name", fn, static_desc=...)`` or decorator form."""
    if fn is None:
        return lambda f: AOTProgram(name, f, static_desc, enable)
    return AOTProgram(name, fn, static_desc, enable)


def phase_desc(*objs, mesh=None, extra=""):
    """Fingerprint of everything a phase program closes over, or None.

    None (caller uses plain jit) when the cache is disabled, a multi-device
    mesh is active (``jax.export`` pins shardings, and the CPU dryrun
    fabricates device counts per process), or fingerprinting fails — a
    structure we cannot hash must NEVER silently reuse an artifact.

    Callers pass every object whose *data* is baked into the traced program
    as a closure constant (prob model, simulator, optimizer) plus ``extra``
    for static scalars (step counts, batch sizes) not visible in the
    argument signature.
    """
    if mesh is not None and getattr(mesh, "size", 1) > 1:
        return None
    if not enabled():
        return None
    try:
        return data_fingerprint(*objs) + "|" + str(extra)
    except Exception:
        return None
