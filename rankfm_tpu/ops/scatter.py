"""Pallas table-update primitive: scatter-add with fused per-touch L2 decay.

XLA lowers ``table.at[idx].add(upd)`` on TPU to a (near-)serial scatter —
~0.5 us per update row, which at 16k updates/batch costs more than the rest
of the training step combined. This op replaces it with a tiled one-hot
matmul: the table streams through VMEM tile by tile and each tile receives
its updates as a ``[*, TILE] x [*, W]`` MXU contraction — no serialization,
no [B, N] HBM materialization.

Two kernel variants, chosen at runtime:

* **dense** — every tile contracts against ALL ``B2`` updates. Cost
  O(B2 * N * 128) MACs; right for small tables.
* **sorted** — updates are pre-sorted by row index, so tile ``t`` only
  contracts against the ``TB``-row span that can touch it (its start comes
  from a ``searchsorted`` prefix passed through SMEM). Cost
  O(nTiles * TB * TILE * 128): ~4x cheaper at 33k rows and the only viable
  shape at millions of rows. A span that overflows ``TB`` (pathological
  concentration) falls back to the dense kernel via ``lax.cond``.

The update applied per tile matches `rankfm_tpu.ops.training._decay_apply`
(the geometric-corrected per-touch decay of the reference's per-sample
``w -= eta*2*reg*w`` at `/root/reference/rankfm/_rankfm.pyx:279-326`):

    cnt   = #updates touching the row (counted in-kernel, free MXU column)
    ck    = c^cnt,   c = 1 - eta*2*reg
    f     = (1 - ck) / (cnt * (1 - c))          (1 when cnt == 0)
    tab   = ck * tab + eta * f * sum(updates)

Layout trick: the factor table ``tab [N, F]`` and its bias column
``bias [N]`` share one update call — ``upd [B, 128]`` carries the factor
gradient in cols ``0..F-1``, the bias gradient in col ``F``, and a validity
1.0 in col ``F+1`` whose contraction yields the touch count.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def _apply(tab_in, bias_in, scat, eta, c, F):
    cnt = scat[:, F + 1:F + 2]                                   # [TILE,1]
    ck = jnp.exp(cnt * jnp.log(c))
    denom = cnt * (1.0 - c)
    f = jnp.where(denom > 1e-12, (1.0 - ck) / jnp.maximum(denom, 1e-12), 1.0)
    return (tab_in[:] * ck + (eta * f) * scat[:, :F],
            bias_in[:] * ck + (eta * f) * scat[:, F:F + 1])


def _kernel_dense(idx_ref, upd_ref, eta_ref, c_ref, tab_in, bias_in,
                  tab_out, bias_out, *, TILE, F, B2):
    t = pl.program_id(0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B2, TILE), 1) + t * TILE
    oh = (idx_ref[:] == cols).astype(jnp.bfloat16)               # [B2,TILE]
    scat = jax.lax.dot_general(
        oh, upd_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                      # [TILE,128]
    tab_out[:], bias_out[:] = _apply(tab_in, bias_in, scat,
                                     eta_ref[0], c_ref[0], F)


def _kernel_sorted(lo_ref, idx_ref, upd_ref, eta_ref, c_ref, tab_in, bias_in,
                   tab_out, bias_out, *, TILE, F, B2, TB):
    t = pl.program_id(0)
    base = pl.multiple_of(jnp.clip(lo_ref[t] & ~7, 0, B2 - TB), 8)
    idxt = idx_ref[pl.ds(base, TB), :]                           # [TB,1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (TB, TILE), 1) + t * TILE
    oh = (idxt == cols).astype(jnp.bfloat16)      # out-of-tile rows -> 0
    scat = jax.lax.dot_general(
        oh, upd_ref[pl.ds(base, TB), :], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                      # [TILE,128]
    tab_out[:], bias_out[:] = _apply(tab_in, bias_in, scat,
                                     eta_ref[0], c_ref[0], F)


def _specs(tile, F, extra_smem=0):
    smem = [pl.BlockSpec(memory_space=pltpu.SMEM)] * (extra_smem + 2)
    return smem, [
        pl.BlockSpec((tile, F), lambda t: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
    ]


@lru_cache(maxsize=32)
def _make_dense_call(n_pad, F, B2, tile):
    nT = n_pad // tile
    kern = partial(_kernel_dense, TILE=tile, F=F, B2=B2)
    smem, table_specs = _specs(tile, F)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(nT,),
            in_specs=[
                pl.BlockSpec((B2, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B2, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ] + smem + table_specs,
            out_specs=table_specs,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, F), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )


@lru_cache(maxsize=32)
def _make_sorted_call(n_pad, F, B2, tile, tb):
    nT = n_pad // tile
    kern = partial(_kernel_sorted, TILE=tile, F=F, B2=B2, TB=tb)
    _, table_specs = _specs(tile, F)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(nT,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),                         # lo
                pl.BlockSpec((B2, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B2, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),                         # eta
                pl.BlockSpec(memory_space=pltpu.SMEM),                         # c
            ] + table_specs,
            out_specs=table_specs,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, F), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )


def apply_table_update(tab, bias, idx, upd, eta, c, tile=2048):
    """``tab [N,F]``, ``bias [N]``; ``idx [B2] int32`` (-1 = skip),
    ``upd [B2, F+2]`` (factor grad | bias grad | validity). Returns the
    decayed + updated ``(tab, bias)``. Jit-traceable; shapes static."""
    N, F = tab.shape
    # pad the update rows to a multiple of 8 (idx=-1 rows are no-ops): the
    # sorted kernel's span starts are clipped to B2-TB, and only when B2 and
    # TB are both multiples of 8 is every clipped start truly 8-aligned (a
    # false `multiple_of` hint would silently miscompile the dynamic slice)
    B2 = _round_up(idx.shape[0], 8)
    if B2 != idx.shape[0]:
        pad_n = B2 - idx.shape[0]
        idx = jnp.concatenate([idx, jnp.full((pad_n,), -1, idx.dtype)])
        upd = jnp.concatenate(
            [upd, jnp.zeros((pad_n, upd.shape[1]), upd.dtype)])
    tile = min(tile, _round_up(N, 8))
    n_pad = _round_up(N, tile)
    nT = n_pad // tile
    upd128 = jnp.zeros((B2, LANES), jnp.bfloat16).at[:, :F + 2].set(
        upd.astype(jnp.bfloat16))
    tab_p = tab if n_pad == N else jnp.pad(tab, ((0, n_pad - N), (0, 0)))
    bias_p = bias[:, None] if n_pad == N else jnp.pad(
        bias[:, None], ((0, n_pad - N), (0, 0)))
    idx2 = idx[:, None].astype(jnp.int32)
    eta1 = jnp.reshape(eta.astype(jnp.float32), (1,))
    c1 = jnp.reshape(c.astype(jnp.float32), (1,))

    # sorted fast path: tile t only sees the TB-row span that can touch it
    # (4x the expected span; pathological concentration falls back to dense)
    tb = _round_up(min(B2, max(1024, 4 * B2 // max(nT, 1))), 8)
    if nT >= 8 and tb < B2:
        order = jnp.argsort(idx)
        idx_s = idx[order][:, None].astype(jnp.int32)
        upd_s = upd128[order]
        bounds = jnp.arange(nT + 1, dtype=jnp.int32) * tile
        edges = jnp.searchsorted(idx_s[:, 0], bounds).astype(jnp.int32)
        lo, hi = edges[:-1], edges[1:]
        fits = jnp.max(hi - (lo & ~7)) <= tb

        def sorted_path(_):
            call = _make_sorted_call(n_pad, F, B2, tile, tb)
            return call(lo, idx_s, upd_s, eta1, c1, tab_p, bias_p)

        def dense_path(_):
            call = _make_dense_call(n_pad, F, B2, tile)
            return call(idx2, upd128, eta1, c1, tab_p, bias_p)

        tab2, bias2 = jax.lax.cond(fits, sorted_path, dense_path, None)
    else:
        call = _make_dense_call(n_pad, F, B2, tile)
        tab2, bias2 = call(idx2, upd128, eta1, c1, tab_p, bias_p)
    return tab2[:N], bias2[:N, 0]
