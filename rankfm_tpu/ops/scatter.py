"""Pallas table-update primitive: scatter-add with fused per-touch L2 decay.

XLA lowers ``table.at[idx].add(upd)`` on TPU to a (near-)serial scatter —
~0.5 us per update row, which at 16k updates/batch costs more than the rest
of the training step combined. This op replaces it with a tiled one-hot
matmul: the table streams through VMEM tile by tile and each tile receives
its updates as a ``[B, TILE] x [B, W]`` MXU contraction — no serialization,
no [B, N] HBM materialization.

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


def _kernel(idx_ref, upd_ref, eta_ref, c_ref, tab_in, bias_in,
            tab_out, bias_out, *, TILE, F, B2):
    t = pl.program_id(0)
    eta = eta_ref[0]
    c = c_ref[0]

    idx = idx_ref[:]                                             # [B2,1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (B2, TILE), 1) + t * TILE
    oh = (idx == cols).astype(jnp.bfloat16)                      # [B2,TILE]
    scat = jax.lax.dot_general(
        oh, upd_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                      # [TILE,128]

    cnt = scat[:, F + 1:F + 2]                                   # [TILE,1]
    ck = jnp.exp(cnt * jnp.log(c))
    denom = cnt * (1.0 - c)
    f = jnp.where(denom > 1e-12, (1.0 - ck) / jnp.maximum(denom, 1e-12), 1.0)
    tab_out[:] = tab_in[:] * ck + (eta * f) * scat[:, :F]
    bias_out[:] = bias_in[:] * ck + (eta * f) * scat[:, F:F + 1]


@lru_cache(maxsize=32)
def _make_call(n_pad, F, B2, tile):
    nT = n_pad // tile
    kern = partial(_kernel, TILE=tile, F=F, B2=B2)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nT,),
            in_specs=[
                pl.BlockSpec((B2, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B2, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),                      # eta
                pl.BlockSpec(memory_space=pltpu.SMEM),                      # c
                pl.BlockSpec((tile, F), lambda t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile, F), lambda t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, F), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )


def apply_table_update(tab, bias, idx, upd, eta, c, tile=2048):
    """``tab [N,F]``, ``bias [N]``; ``idx [B2] int32`` (-1 = skip),
    ``upd [B2, F+2] `` (factor grad | bias grad | validity). Returns the
    decayed + updated ``(tab, bias)``. Jit-traceable; shapes static."""
    N, F = tab.shape
    B2 = idx.shape[0]
    tile = min(tile, _round_up(N, 8))
    n_pad = _round_up(N, tile)
    upd128 = jnp.zeros((B2, LANES), jnp.bfloat16).at[:, :F + 2].set(
        upd.astype(jnp.bfloat16))
    tab_p = tab if n_pad == N else jnp.pad(tab, ((0, n_pad - N), (0, 0)))
    bias_p = bias[:, None] if n_pad == N else jnp.pad(
        bias[:, None], ((0, n_pad - N), (0, 0)))
    call = _make_call(n_pad, F, B2, tile)
    tab2, bias2 = call(
        idx[:, None].astype(jnp.int32), upd128,
        jnp.reshape(eta.astype(jnp.float32), (1,)),
        jnp.reshape(c.astype(jnp.float32), (1,)),
        tab_p, bias_p)
    return tab2[:N], bias2[:N, 0]
