"""AOT executable cache (`rankfm_tpu.utils.aotcache`).

The cache exists to sidestep backend persistent-cache key drift for the
Mosaic-bearing fit programs (BENCHMARKS.md warmup story): executables are
serialized under a content key we compute. These tests force-enable it on
CPU and verify the full store → fresh-process-style load path, including
that a load really skips compilation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankfm_tpu.utils import aotcache


@pytest.fixture()
def aot_env(tmp_path, monkeypatch):
    monkeypatch.setenv("RANKFM_TPU_AOT_CACHE", "1")
    monkeypatch.delenv("RANKFM_TPU_NO_CACHE", raising=False)
    monkeypatch.setattr(aotcache, "cache_dir", lambda: str(tmp_path))
    monkeypatch.setattr(aotcache, "_LOADED", {})
    return tmp_path


def _make_jitted():
    def f(w, x, n_static, eta):
        return {"w": w["w"] + eta * x[:n_static].sum()}, jnp.sum(x)

    return jax.jit(f, static_argnums=(2,))


def test_wrap_compiles_stores_and_matches(aot_env):
    jitted = _make_jitted()
    w = {"w": jnp.ones((8,))}
    x = jnp.arange(16, dtype=jnp.float32)
    ref_out, ref_ll = jitted(w, x, 4, 0.5)

    wrapped = aotcache.wrap(jitted, key_parts=(8, 16), tag="t",
                            static_argnums=(2,))
    out, ll = wrapped(w, x, 4, 0.5)
    np.testing.assert_allclose(out["w"], ref_out["w"])
    assert float(ll) == float(ref_ll)
    payloads = list(aot_env.glob("t-*.pkl"))
    assert len(payloads) == 1, "executable payload should be stored"


def test_cold_compile_uses_aot_executable_not_jit_fallback(aot_env):
    """the fresh-compile path must wrap statics out exactly like the
    disk-load path: a static-bearing Compiled takes only dynamic args, and
    calling it with all args used to TypeError -> silent jit fallback
    (paying the cold compile twice)"""
    jitted = _make_jitted()
    w = {"w": jnp.ones((8,))}
    x = jnp.arange(16, dtype=jnp.float32)
    wrapped = aotcache.wrap(jitted, key_parts=(8, 16), tag="t",
                            static_argnums=(2,))
    out, _ = wrapped(w, x, 4, 0.5)
    # the memoized resolved fn must be the AOT executable (or its static
    # shim), never the jitted fallback — and it must answer correctly
    (key, fn), = aotcache._LOADED.items()
    assert fn is not jitted
    out2, _ = fn(w, x, 4, 0.5)
    np.testing.assert_allclose(out2["w"], out["w"])


def test_changed_static_value_reresolves(aot_env):
    """a later call with a different STATIC value must not replay the
    executable compiled for the old value (first-call-wins memoization
    would silently run the n=4 program for n=6)"""
    jitted = _make_jitted()
    w = {"w": jnp.ones((8,))}
    x = jnp.arange(16, dtype=jnp.float32)
    wrapped = aotcache.wrap(jitted, key_parts=(8, 16), tag="t",
                            static_argnums=(2,))
    out4, _ = wrapped(w, x, 4, 0.5)
    out6, _ = wrapped(w, x, 6, 0.5)
    ref4, _ = jitted(w, x, 4, 0.5)
    ref6, _ = jitted(w, x, 6, 0.5)
    np.testing.assert_allclose(out4["w"], ref4["w"])
    np.testing.assert_allclose(out6["w"], ref6["w"])
    assert len(list(aot_env.glob("t-*.pkl"))) == 2, \
        "each static value is its own program/payload"
    # and flipping BACK re-resolves again (via the in-process memo)
    back4, _ = wrapped(w, x, 4, 0.5)
    np.testing.assert_allclose(back4["w"], ref4["w"])


def test_fresh_process_load_skips_compile(aot_env):
    jitted = _make_jitted()
    w = {"w": jnp.ones((8,))}
    x = jnp.arange(16, dtype=jnp.float32)
    wrapped = aotcache.wrap(jitted, key_parts=(8, 16), tag="t",
                            static_argnums=(2,))
    ref_out, _ = wrapped(w, x, 4, 0.5)

    # simulate a fresh process: drop the in-memory memo, and hand wrap() a
    # decoy whose .lower() explodes — a cache HIT never lowers/compiles
    aotcache._LOADED.clear()

    class Decoy:
        def lower(self, *a):  # pragma: no cover - hit means never called
            raise AssertionError("cache miss: lower() was called")

        def __call__(self, *a):  # fallback would also be a failure
            raise AssertionError("cache miss: decoy executed")

    wrapped2 = aotcache.wrap(Decoy(), key_parts=(8, 16), tag="t",
                             static_argnums=(2,))
    out2, ll2 = wrapped2(w, x, 4, 0.5)
    np.testing.assert_allclose(out2["w"], ref_out["w"])
    assert float(ll2) == float(x.sum())


def test_key_separates_shapes_and_static_values(aot_env):
    jitted = _make_jitted()
    w = {"w": jnp.ones((8,))}
    x = jnp.arange(16, dtype=jnp.float32)
    k1 = aotcache._key("t", (), (w, x, 4, 0.5), static_set=frozenset({2}))
    k2 = aotcache._key("t", (), (w, x, 5, 0.5), static_set=frozenset({2}))
    k3 = aotcache._key("t", (), (w, jnp.zeros((32,)), 4, 0.5),
                       static_set=frozenset({2}))                   # shape
    assert k1 != k2, "STATIC int values select programs — must separate"
    assert k1 != k3
    # dynamic scalars are traced: their VALUES must not fragment the key
    # (the epoch counter differs per call; eta differs per epoch)
    k5 = aotcache._key("t", (), (w, x, 4, 0.5))
    k6 = aotcache._key("t", (), (w, x, 5, 0.9))
    assert k5 == k6, "traced int/float values must not fragment the key"


def test_disabled_returns_jitted_unchanged(monkeypatch):
    monkeypatch.setenv("RANKFM_TPU_NO_CACHE", "1")
    jitted = _make_jitted()
    assert aotcache.wrap(jitted) is jitted


def test_model_fit_populates_aot_cache(aot_env):
    """End-to-end: a fit through the XLA epoch path must AOT-store its
    epoch executable and train to finite weights, and an identical
    config must map to the same key (so a fresh process would replay it).

    Replay execution itself is covered by the unit tests above: XLA:CPU's
    AOT *loader* is unreliable for large multi-fusion programs in this
    environment (missing fused-function symbols) — which is why
    `enabled()` defaults to TPU-only; the real-device replay is exercised
    by the verify drive / bench warmup.
    """
    import pandas as pd
    from rankfm_tpu import RankFM

    rng = np.random.default_rng(3)
    inter = pd.DataFrame({
        "user_id": rng.integers(0, 30, 400),
        "item_id": rng.integers(0, 50, 400),
    })

    m1 = RankFM(factors=4, loss="warp", max_samples=3)
    m1.fit(inter, epochs=2)
    assert m1.is_fit and np.isfinite(m1.v_i).all()
    payloads = list(aot_env.glob("xla_epoch-*.pkl"))
    if not payloads:
        # XLA:CPU executable serialization has thunk-level gaps (e.g.
        # "`LessThan` is not serializable", seen when other session state
        # shifts thunk selection) — the graceful fallback to the plain jit
        # path is exactly the contract; nothing further to check here
        pytest.skip("XLA:CPU could not serialize this program")
    assert len(payloads) == 1, "fit should store ONE epoch executable"

    # an identical config in a fresh process computes the same key
    m2 = RankFM(factors=4, loss="warp", max_samples=3)
    m2.fit(inter, epochs=2)
    assert list(aot_env.glob("xla_epoch-*.pkl")) == payloads, \
        "identical config must hit the same cache entry"


def test_stats_report_compile_and_deser_wall_time(aot_env):
    """stats() carries the warmup decomposition bench.py reports
    (VERDICT r3 #1): a cold call accrues compile_s, a fresh-process-style
    reload accrues deser_s, and the two are disjoint."""
    jitted = _make_jitted()
    w = {"w": jnp.ones((8,))}
    x = jnp.arange(16, dtype=jnp.float32)

    aotcache._STATS.clear()
    wrapped = aotcache.wrap(jitted, key_parts=("t",), tag="timed",
                            static_argnums=(2,))
    wrapped(w, x, 4, 0.5)
    st = aotcache.stats()["timed"]
    assert st["compiles"] == 1 and st["compile_s"] > 0
    assert st["disk_hits"] == 0 and st["deser_s"] == 0

    # fresh process analog: drop the in-memory memo, keep the disk payload
    aotcache._LOADED.clear()
    aotcache._STATS.clear()
    wrapped2 = aotcache.wrap(_make_jitted(), key_parts=("t",), tag="timed",
                             static_argnums=(2,))
    wrapped2(w, x, 4, 0.5)
    st = aotcache.stats()["timed"]
    assert st["disk_hits"] == 1 and st["deser_s"] > 0
    assert st["compiles"] == 0 and st["compile_s"] == 0
