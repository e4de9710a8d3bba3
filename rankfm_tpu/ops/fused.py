"""Fused Pallas WARP/BPR training kernel — the flagship TPU-native hot loop.

Replaces the per-step XLA graph (gathers, candidate scoring, scatter-adds —
each a separate HBM-bound kernel with ~0.3-1 ms launch+access overhead) with
ONE Mosaic kernel per minibatch in which:

* the user and item tables live in VMEM scratch for the whole batch
  (persisted across grid steps), so every "gather"/"scatter-add" is a small
  one-hot bf16 matmul on the MXU — random HBM access is eliminated;
* the item bias ``w_i`` rides as an extra table column: tables are
  ``[*, 128]`` with factors in cols ``0..F-1``, col ``F`` = bias (items) or
  the constant 1 (users), so the FM utility is a single 128-lane dot;
* WARP sampling is reformulated *exactly* through the full score row:
  with per-user scores for ALL items ([C, I] matmul) and the history mask,
  the reference's sequential rejection loop (`_rankfm.pyx:244-270`) is
  equivalent to: draw ``sampled ~ 1 + Geometric(p)`` with
  ``p = |violators| / |non-members|``; if ``sampled <= max_samples`` pick a
  UNIFORM violator (via masked-random argmax), else pick the hardest
  (min-pairwise) non-violating non-member — no candidate gathers at all;
* user histories are bit-packed COLUMN-MAJOR, 16 bits per int32 lane
  (``item i -> lane i mod W, bit i div W``), because `pltpu.repeat` tiles
  along lanes; 16 bits keeps values < 2^24 so the float bit-extraction
  arithmetic is exact;
* per-touch L2 decay (`_rankfm.pyx:279-326`) is applied with exact per-chunk
  touch counts (one-hot count matmuls), linearized within a 128-row chunk
  (counts are tiny, error O(count^2 * (2*alpha*eta)^2)).

Eligibility: no side features (the reference's feature terms are exercised
via the XLA path), factors <= 126, and both extended tables fitting the VMEM
budget. The public `RankFM.fit` auto-dispatches.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BITS_PER_LANE = 16
MARGIN = 1.0


def _round_up(x, m):
    return (x + m - 1) // m * m


def fused_eligible(num_users, num_items, factors, x_uf_any, x_if_any,
                   vmem_table_budget=8 * 2**20):
    """Can the fused kernel run this configuration?"""
    if x_uf_any or x_if_any or factors > LANES - 2:
        return False
    u_pad = _round_up(num_users, 8)
    i_pad = _round_up(num_items, LANES)
    return (u_pad + i_pad) * LANES * 4 <= vmem_table_budget


def pack_history_16(offsets, flat_items, num_users, i_pad):
    """Column-major 16-bit history pack: item ``i`` lives at int32 lane
    ``i % W`` bit ``i // W`` where ``W = i_pad / 16``. Pad items (>= I) are
    left 0 and masked inside the kernel via the column iota."""
    W = i_pad // BITS_PER_LANE
    bits = np.zeros((num_users, i_pad), dtype=np.int32)
    counts = np.diff(offsets).astype(np.int64)
    users = np.repeat(np.arange(num_users, dtype=np.int64), counts)
    bits[users, flat_items.astype(np.int64)] = 1
    packed = np.zeros((num_users, W), dtype=np.int32)
    for k in range(BITS_PER_LANE):
        packed |= bits[:, k * W:(k + 1) * W] << k
    return packed


def extend_tables(w_i, v_u, v_i, u_pad, i_pad):
    """[U,F]/[I,F]/[I] -> [U_pad,128] (col F = 1) and [I_pad,128] (col F = w_i)."""
    F = v_u.shape[1]
    U, I = v_u.shape[0], v_i.shape[0]
    tu = jnp.zeros((u_pad, LANES), jnp.float32)
    tu = tu.at[:U, :F].set(v_u)
    tu = tu.at[:U, F].set(1.0)
    ti = jnp.zeros((i_pad, LANES), jnp.float32)
    ti = ti.at[:I, :F].set(v_i)
    ti = ti.at[:I, F].set(w_i)
    return tu, ti


def extract_tables(tab_u, tab_i, num_users, num_items, factors):
    v_u = tab_u[:num_users, :factors]
    v_i = tab_i[:num_items, :factors]
    w_i = tab_i[:num_items, factors]
    return w_i, v_u, v_i


def _kernel(u_ref, i_ref, swv_ref, mask_ref, vu_in, vi_in,
            seed_ref, eta_ref, dreg_ref,
            vu_out, vi_out, ll_out,
            tab_u, tab_i, ll_acc, copy_sem,
            *, U_pad, I_pad, F, M, C, num_items):
    W = I_pad // BITS_PER_LANE
    t = pl.program_id(0)
    nT = pl.num_programs(0)
    log_I = math.log(num_items)

    @pl.when(t == 0)
    def _load():
        cin_u = pltpu.make_async_copy(vu_in, tab_u, copy_sem.at[0])
        cin_i = pltpu.make_async_copy(vi_in, tab_i, copy_sem.at[1])
        cin_u.start()
        cin_i.start()
        cin_u.wait()
        cin_i.wait()
        ll_acc[0] = 0.0

    pltpu.prng_seed(seed_ref[0] + t)

    u = u_ref[:]                                     # [C,1] int32
    i = i_ref[:]
    sw = swv_ref[:, 0:1]                             # [C,1] f32 sample weight
    valid = swv_ref[:, 1:2]                          # [C,1] f32 0/1
    eta = eta_ref[0]
    dreg = dreg_ref[0]                               # eta * 2 * alpha

    # ---- one-hot gathers (MXU) ----
    cols_u = jax.lax.broadcasted_iota(jnp.int32, (C, U_pad), 1)
    oh_u = ((u == cols_u).astype(jnp.float32) * valid).astype(jnp.bfloat16)
    u_rows = jnp.dot(oh_u, tab_u[:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)          # [C,128]
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (C, I_pad), 1)
    oh_i = ((i == cols_i).astype(jnp.float32) * valid).astype(jnp.bfloat16)
    i_rows = jnp.dot(oh_i, tab_i[:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)

    # ---- score ALL items; pairwise utility row ----
    all_s = jax.lax.dot_general(
        u_rows.astype(jnp.bfloat16), tab_i[:].astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)  # [C,I_pad]
    ut_ui = jnp.sum(u_rows * i_rows, axis=1, keepdims=True)            # [C,1]
    pw = ut_ui - all_s                                                 # [C,I_pad]

    # ---- history membership from packed bits ----
    v = pltpu.repeat(mask_ref[:].astype(jnp.float32), BITS_PER_LANE, axis=1)
    kbit = (cols_i // W).astype(jnp.float32)
    tb = jnp.floor(v * jnp.exp2(-kbit))
    member = tb - 2.0 * jnp.floor(tb * 0.5)                            # 1.0 = seen
    member = jnp.where(cols_i < num_items, member, 1.0)                # pad = seen

    nonmem = 1.0 - member
    violf = nonmem * (pw < MARGIN).astype(jnp.float32)
    nv = jnp.sum(violf, axis=1, keepdims=True)                         # [C,1]
    n_nonmem = jnp.sum(nonmem, axis=1, keepdims=True)

    # ---- exact WARP draw count: sampled ~ min(M, 1 + Geometric(p)) ----
    rbits = pltpu.bitcast(pltpu.prng_random_bits((C, LANES)), jnp.int32)
    r1 = rbits[:, 0:1].astype(jnp.float32) * (2.0 ** -32) + 0.5        # U[0,1)
    p = nv / jnp.maximum(n_nonmem, 1.0)
    p_c = jnp.clip(p, 1e-9, 1.0 - 1e-7)
    geo = jnp.floor(jnp.log(jnp.maximum(1.0 - r1, 1e-30))
                    / jnp.log(1.0 - p_c)) + 1.0
    geo = jnp.where(nv > 0, geo, jnp.float32(M))
    found = ((nv > 0) & (geo <= M)).astype(jnp.float32)                # [C,1]
    sampled = jnp.minimum(geo, jnp.float32(M))

    # ---- select j: uniform violator (found) / hardest non-violator (else) ----
    big = pltpu.bitcast(pltpu.prng_random_bits((C, I_pad)), jnp.int32)
    u01 = big.astype(jnp.float32) * (2.0 ** -32) + 0.5
    key_found = jnp.where(violf > 0, u01, -jnp.inf)
    mx_f = jnp.max(key_found, axis=1, keepdims=True)
    oh_f = ((key_found == mx_f) & (violf > 0)).astype(jnp.float32)
    nonviol = nonmem * (1.0 - violf)
    key_fb = jnp.where(nonviol > 0, -pw, -jnp.inf)
    mx_b = jnp.max(key_fb, axis=1, keepdims=True)
    oh_b = ((key_fb == mx_b) & (nonviol > 0)).astype(jnp.float32)
    oh_j = jnp.where(found > 0, oh_f, oh_b) * valid                    # [C,I_pad]
    cnt_j = jnp.sum(oh_j, axis=1, keepdims=True)
    oh_jn = oh_j / jnp.maximum(cnt_j, 1.0)                             # tie-split
    has_j = (cnt_j > 0).astype(jnp.float32)
    pw_sel = jnp.sum(pw * oh_jn, axis=1, keepdims=True)                # [C,1]

    # ---- multiplier, outer derivative, log-likelihood ----
    ratio = jnp.maximum(jnp.floor((num_items - 1) / sampled), 1.0)
    mult = jnp.log(ratio) / log_I
    d = valid * has_j * sw * mult * jax.nn.sigmoid(-pw_sel)            # [C,1]
    ll_acc[0] += jnp.sum(valid * has_j * jax.nn.log_sigmoid(pw_sel))

    # ---- gradient rows + one-hot scatter-adds (MXU) ----
    oh_jb = oh_jn.astype(jnp.bfloat16)
    j_rows = jnp.dot(oh_jb, tab_i[:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)               # [C,128]
    lane = jax.lax.broadcasted_iota(jnp.int32, (C, LANES), 1)
    fmask = (lane < F).astype(jnp.float32)
    g_u = (d * (i_rows - j_rows)) * fmask                              # [C,128]
    g_ip = d * u_rows                                                  # [C,128]

    ones_c = jnp.ones((C, 1), jnp.bfloat16)
    count_u = jax.lax.dot_general(oh_u, ones_c, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # [U_pad,1]
    count_i = jax.lax.dot_general(oh_i + oh_jb, ones_c, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # [I_pad,1]

    lane_u = jax.lax.broadcasted_iota(jnp.int32, (U_pad, LANES), 1)
    decay_u = jnp.where(lane_u < F, 1.0 - dreg * count_u, 1.0)         # keep col F = 1
    scat_u = jax.lax.dot_general(oh_u, g_u.astype(jnp.bfloat16),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    tab_u[:] = tab_u[:] * decay_u + eta * scat_u

    scat_i = jax.lax.dot_general(oh_i, g_ip.astype(jnp.bfloat16),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    scat_j = jax.lax.dot_general(oh_jb, (-g_ip).astype(jnp.bfloat16),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    tab_i[:] = tab_i[:] * (1.0 - dreg * count_i) + eta * (scat_i + scat_j)

    @pl.when(t == nT - 1)
    def _store():
        ll_out[0, 0] = ll_acc[0]
        cout_u = pltpu.make_async_copy(tab_u, vu_out, copy_sem.at[0])
        cout_i = pltpu.make_async_copy(tab_i, vi_out, copy_sem.at[1])
        cout_u.start()
        cout_i.start()
        cout_u.wait()
        cout_i.wait()


@lru_cache(maxsize=16)
def make_fused_batch_fn(num_users, num_items, factors, max_samples,
                        batch_size, chunk=128):
    """Build ``fn(tab_u, tab_i, u, i, swv, mask_rows, seed, eta, dreg)
    -> (tab_u, tab_i, ll)`` running one minibatch fully fused.

    ``u/i [B,1] int32``, ``swv [B,2] f32`` (sample_weight, valid),
    ``mask_rows [B, I_pad/16] int32`` pre-gathered packed history rows.
    """
    U_pad = _round_up(num_users, 8)
    I_pad = _round_up(num_items, LANES)
    W = I_pad // BITS_PER_LANE
    C = chunk
    assert batch_size % C == 0
    nT = batch_size // C

    kern = partial(_kernel, U_pad=U_pad, I_pad=I_pad, F=factors,
                   M=max_samples, C=C, num_items=num_items)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nT,),
        in_specs=[
            pl.BlockSpec((C, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),   # u
            pl.BlockSpec((C, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),   # i
            pl.BlockSpec((C, 2), lambda t: (t, 0), memory_space=pltpu.VMEM),   # swv
            pl.BlockSpec((C, W), lambda t: (t, 0), memory_space=pltpu.VMEM),   # mask
            pl.BlockSpec(memory_space=pltpu.ANY),                              # vu_in
            pl.BlockSpec(memory_space=pltpu.ANY),                              # vi_in
            pl.BlockSpec(memory_space=pltpu.SMEM),                             # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),                             # eta
            pl.BlockSpec(memory_space=pltpu.SMEM),                             # dreg
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),                              # vu_out
            pl.BlockSpec(memory_space=pltpu.ANY),                              # vi_out
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),   # ll
        ],
        scratch_shapes=[
            pltpu.VMEM((U_pad, LANES), jnp.float32),
            pltpu.VMEM((I_pad, LANES), jnp.float32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((U_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((I_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
    )

    def fn(tab_u, tab_i, u, i, swv, mask_rows, seed, eta, dreg):
        tu, ti, ll = call(u, i, swv, mask_rows, tab_u, tab_i, seed, eta, dreg)
        return tu, ti, ll[0, 0]

    return fn


@lru_cache(maxsize=16)
def make_fused_epoch_fn(num_users, num_items, factors, max_samples, batch_size,
                        chunk=128, donate=True):
    """Whole-epoch driver around the fused kernel: device shuffle, packed-mask
    row gather per step (XLA), `lax.scan` over minibatches.

    Signature: ``epoch_fn(tab_u, tab_i, packed_hist, u, i, sw, n_real, eta,
    alpha, key) -> (tab_u, tab_i, ll)`` with u/i/sw padded 1-D columns.
    """
    batch_fn = make_fused_batch_fn(num_users, num_items, factors, max_samples,
                                   batch_size, chunk)

    def epoch_fn(tab_u, tab_i, packed_hist, u, i, sw, n_real, eta, alpha, key):
        n_pad = u.shape[0]
        nb = n_pad // batch_size
        kperm, ksamp = jax.random.split(key)
        perm = jax.random.permutation(kperm, n_pad)
        valid = (perm < n_real).astype(jnp.float32)
        ub = u[perm].reshape(nb, batch_size, 1)
        ib = i[perm].reshape(nb, batch_size, 1)
        swb = sw[perm].reshape(nb, batch_size, 1)
        vb = valid.reshape(nb, batch_size, 1)
        swv = jnp.concatenate([swb, vb], axis=-1)                # [nb,B,2]
        seeds = jax.random.randint(ksamp, (nb,), 0, 2**31 - 1, dtype=jnp.int32)
        eta_arr = jnp.asarray([eta], jnp.float32)
        dreg_arr = jnp.asarray([eta * 2.0 * alpha], jnp.float32)

        def body(carry, xs):
            tu, ti = carry
            ub_, ib_, swv_, seed_ = xs
            mask_rows = packed_hist[ub_[:, 0]]                   # [B, W] gather
            tu, ti, ll = batch_fn(tu, ti, ub_, ib_, swv_, mask_rows,
                                  jnp.asarray([seed_], jnp.int32)[0:1],
                                  eta_arr, dreg_arr)
            return (tu, ti), ll

        (tab_u, tab_i), lls = jax.lax.scan(
            body, (tab_u, tab_i), (ub, ib, swv, seeds))
        return tab_u, tab_i, jnp.sum(lls)

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(epoch_fn, static_argnums=(6,), donate_argnums=donate_argnums)
