"""Tests for the Pallas table-update primitive (`rankfm_tpu.ops.scatter`).

The Mosaic kernel itself needs TPU hardware (gated); the window-WARP step
that consumes it has a CPU-runnable twin exercised in test_ops.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankfm_tpu.ops.training import _decay_apply


@pytest.mark.skipif(jax.devices()[0].platform not in ("tpu",),
                    reason="Mosaic kernel needs TPU hardware")
def test_apply_table_update_matches_decay_oracle():
    from rankfm_tpu.ops.scatter import apply_table_update

    rng = np.random.default_rng(0)
    N, F, B2 = 3000, 50, 4096
    tab = rng.normal(0, 0.1, (N, F)).astype(np.float32)
    bias = rng.normal(0, 0.1, N).astype(np.float32)
    idx = rng.integers(-1, N, B2).astype(np.int32)
    upd = rng.normal(0, 0.1, (B2, F + 2)).astype(np.float32)
    upd[:, F + 1] = (idx >= 0).astype(np.float32)
    eta, reg = 0.1, 0.01
    c = max(1.0 - eta * 2 * reg, 1e-8)

    tab2, bias2 = apply_table_update(
        jnp.asarray(tab), jnp.asarray(bias), jnp.asarray(idx),
        jnp.asarray(upd), jnp.float32(eta), jnp.float32(c))

    ok = idx >= 0
    g_tab = np.zeros((N, F), np.float32)
    g_b = np.zeros(N, np.float32)
    cnt = np.zeros(N, np.float32)
    np.add.at(g_tab, idx[ok], upd[ok, :F])
    np.add.at(g_b, idx[ok], upd[ok, F])
    np.add.at(cnt, idx[ok], 1.0)
    want_tab = np.asarray(_decay_apply(
        jnp.asarray(tab), jnp.asarray(g_tab), jnp.asarray(cnt), eta, reg))
    want_b = np.asarray(_decay_apply(
        jnp.asarray(bias), jnp.asarray(g_b), jnp.asarray(cnt), eta, reg))
    assert np.abs(np.asarray(tab2) - want_tab).max() < 3e-3
    assert np.abs(np.asarray(bias2) - want_b).max() < 3e-3


@pytest.mark.skipif(jax.devices()[0].platform not in ("tpu",),
                    reason="Mosaic kernel needs TPU hardware")
def test_apply_table_update_sorted_path_and_fallback():
    from rankfm_tpu.ops.scatter import apply_table_update

    def oracle(tab, bias, idx, upd, eta, reg):
        ok = idx >= 0
        N, F = tab.shape
        g_tab = np.zeros((N, F), np.float32)
        g_b = np.zeros(N, np.float32)
        cnt = np.zeros(N, np.float32)
        np.add.at(g_tab, idx[ok], upd[ok, :F])
        np.add.at(g_b, idx[ok], upd[ok, F])
        np.add.at(cnt, idx[ok], 1.0)
        return (np.asarray(_decay_apply(jnp.asarray(tab), jnp.asarray(g_tab),
                                        jnp.asarray(cnt), eta, reg)),
                np.asarray(_decay_apply(jnp.asarray(bias), jnp.asarray(g_b),
                                        jnp.asarray(cnt), eta, reg)))

    rng = np.random.default_rng(1)
    N, F, B2 = 33362, 50, 8192
    tab = rng.normal(0, 0.1, (N, F)).astype(np.float32)
    bias = rng.normal(0, 0.1, N).astype(np.float32)
    eta, reg = 0.1, 0.01
    c = max(1.0 - eta * 2 * reg, 1e-8)
    for conc in (False, True):
        idx = (np.full(B2, 7, np.int32) if conc
               else rng.integers(-1, N, B2).astype(np.int32))
        upd = rng.normal(0, 0.1, (B2, F + 2)).astype(np.float32)
        upd[:, F + 1] = (idx >= 0).astype(np.float32)
        tab2, bias2 = apply_table_update(
            jnp.asarray(tab), jnp.asarray(bias), jnp.asarray(idx),
            jnp.asarray(upd), jnp.float32(eta), jnp.float32(c))
        want_t, want_b = oracle(tab, bias, idx, upd, eta, reg)
        assert np.abs(np.asarray(tab2) - want_t).max() < 5e-3, conc
        assert np.abs(np.asarray(bias2) - want_b).max() < 5e-3, conc
