"""Fused Pallas WARP/BPR training kernel — the flagship TPU-native hot loop.

Replaces the per-step XLA graph (gathers, candidate scoring, scatter-adds —
each a separate HBM-bound kernel) with ONE Mosaic kernel per minibatch in
which the user and item tables live in VMEM scratch for the whole batch, so
every "gather"/"scatter-add" is a one-hot bf16 matmul on the MXU and random
HBM access is eliminated.

Design (v3 — per-chunk windows, two-level fit-time bucketing):

* tables are ``[*, 128]`` with factors in cols ``0..F-1``, col ``F`` = item
  bias (item table) or the constant 1 (user table), so the FM utility is a
  single 128-lane dot (see `extend_tables`);
* WARP negative sampling is restricted to ONE random contiguous block of
  ``BLK`` items (the "window") PER CHUNK, drawn with probability
  proportional to each block's real item count (so negatives stay uniform
  over the catalog). Within the window the reference's
  sequential rejection loop (`/root/reference/rankfm/_rankfm.pyx:244-270`)
  is reformulated exactly: draw ``sampled ~ 1 + Geometric(p)`` with
  ``p = |violators| / |non-members|`` estimated on the window; if
  ``sampled <= max_samples`` pick a UNIFORM window violator, else the
  hardest member of a Bernoulli subset emulating "hardest of max_samples
  uniform draws". The window turns every O(I) selection pass into O(BLK) —
  the same statistical move the reference makes by only ever LOOKING at
  ``max_samples`` random candidates instead of the full catalog;
* the epoch layout is fixed at FIT time so every chunk's rows share ONE
  1024-user block AND one 1024-item block (`make_records_grouped`); each
  epoch re-randomizes row order within groups with a single
  segmented-shuffle sort, chunks are visited through a fit-time interleave
  (scalar-prefetch index map — never block-sorted order), and the scan
  body is just the Pallas call. The one-hots then contract over 1024 rows
  instead of U_pad/I_pad (per-chunk cost is catalog-size independent),
  both table updates touch only block slices, and the chunk's
  window-membership words are gathered in-kernel through the user one-hot
  as two exact 8-bit bf16 planes;
* for BPR (``max_samples == 1``) the violator machinery is skipped entirely
  and ``j`` is a uniform non-member of the window — exactly the reference's
  single uniform draw (`rankfm.py:294-297`);
* membership tests come from a 16-bit blocked bit-pack of the user history
  (`pack_history`): integer lane-variable shifts, no transcendentals;
* per-touch L2 decay (`_rankfm.pyx:279-326`) is applied with exact per-chunk
  touch counts, linearized within a chunk; the counts ride spare columns of
  the gradient scatter matmuls (user col F, item col F+1) so no separate
  count passes over the one-hots exist.

Eligibility: no side features (the reference's feature terms run via the XLA
path), factors <= 126, and both extended tables fitting the VMEM budget.
`RankFM.fit` auto-dispatches.
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
MAX_BLK = 1024
# Optional: store the VMEM tables in bf16 with stochastic-rounded updates.
# Halves table VMEM (useful headroom for user-heavy configs) at identical
# measured throughput and quality on ML-1M shapes; kept off by default so
# the weight masters stay exact f32.
TABLE_BF16 = False


def _round_up(x, m):
    return (x + m - 1) // m * m


UBLK = 1024  # user-bucket size: each chunk's rows share one user block


def user_block(num_users):
    """User-block size: the whole (guarded) table when it is small, else
    1024 — chunks are then bucketed so each touches ONE block and the
    user-side one-hot matmuls contract over UB rows instead of U_pad."""
    return min(UBLK, _round_up(num_users + 1, 8))


def user_pad(num_users):
    """User-table padding: at least one spare GUARD row, rounded to a whole
    number of user blocks."""
    ub = user_block(num_users)
    return _round_up(num_users + 1, ub)


def num_user_blocks(num_users):
    return user_pad(num_users) // user_block(num_users)


def block_size(num_items):
    """Window block size: a POWER OF TWO in [128, 1024] (the kernel's bit
    extraction uses lane-index shifts, so BLK/16 must be a power of two)."""
    p = 1 << max(LANES.bit_length() - 1, (max(num_items, 1) - 1).bit_length())
    return min(MAX_BLK, p)


def item_pad(num_items):
    """Item-table padding: a whole number of window blocks."""
    return _round_up(max(num_items, 1), block_size(num_items))


# catalogs beyond this many window blocks fall back to the XLA candidate
# step: per-chunk cost no longer depends on catalog size (two-level
# bucketing), so the cap is set by negative-window coverage quality and the
# tables fitting VMEM, not by compute
FUSED_NBLK_CAP = 64


def fused_table_mode(num_users, num_items, factors, x_uf_any, x_if_any,
                     vmem_table_budget=12 * 2**20):
    """How the fused kernel can run this configuration.

    Returns ``'f32'`` (tables fit in f32), ``'bf16'`` (only the
    stochastically-rounded bf16 tables fit — validated at identical
    throughput/quality), or ``None`` (ineligible). The VMEM budget leaves
    ~4 MB of the ~16 MB/core for scratch and chunk temporaries. Beyond 8
    window blocks each chunk rotates 4 negative windows per draw (coverage;
    see `make_fused_batch_fn`); beyond `FUSED_NBLK_CAP` blocks the XLA
    candidate step takes over (see `RankFM.fit_partial`).
    """
    if x_uf_any or x_if_any or factors > LANES - 2:
        return None
    i_pad = item_pad(num_items)
    if i_pad // block_size(num_items) > FUSED_NBLK_CAP:
        return None
    rows = _round_up(num_users, 8) + i_pad
    if rows * LANES * 4 <= vmem_table_budget:
        return 'f32'
    if rows * LANES * 2 <= vmem_table_budget:
        return 'bf16'
    return None


def fused_eligible(num_users, num_items, factors, x_uf_any, x_if_any,
                   vmem_table_budget=12 * 2**20):
    """Can the fused kernel run this configuration (either table dtype)?"""
    return fused_table_mode(num_users, num_items, factors, x_uf_any,
                            x_if_any, vmem_table_budget) is not None


def _pack_coords(items, blk):
    """item index -> (lane, bit) in the blocked 16-bit pack.

    Block ``b = i // blk`` occupies lanes ``[b*LW, (b+1)*LW)`` with
    ``LW = blk/16``; within the block, item ``j`` lives at lane ``j % LW``,
    bit ``j // LW`` — chosen so that `pltpu.repeat` (which TILES along
    lanes) reconstructs bit ``L // LW`` of word ``L % LW`` at window lane
    ``L``, i.e. exactly item ``L``.
    """
    lw = blk // BITS_PER_LANE
    b = items // blk
    j = items - b * blk
    return b * lw + (j % lw), j // lw


def pack_history(offsets, flat_items, num_users, num_items):
    """Host-side blocked 16-bit history pack -> int32 [U, NBLK*BLK/16].

    Items ``>= num_items`` (window padding) are marked as members for every
    user so they can never be drawn as negatives.
    """
    blk = block_size(num_items)
    i_pad = item_pad(num_items)
    w = i_pad // BITS_PER_LANE
    packed = np.zeros((num_users, w), dtype=np.int32)
    counts = np.diff(offsets).astype(np.int64)
    users = np.repeat(np.arange(num_users, dtype=np.int64), counts)
    lane, bit = _pack_coords(flat_items.astype(np.int64), blk)
    np.bitwise_or.at(packed, (users, lane), np.int32(1) << bit)
    packed |= pad_row(num_items)[None, :]
    return packed


def pad_row(num_items):
    """int32 [W] row with the bits of pad items (>= num_items) set."""
    blk = block_size(num_items)
    i_pad = item_pad(num_items)
    w = i_pad // BITS_PER_LANE
    row = np.zeros(w, dtype=np.int32)
    pads = np.arange(num_items, i_pad, dtype=np.int64)
    lane, bit = _pack_coords(pads, blk)
    np.bitwise_or.at(row, lane, np.int32(1) << bit)
    return row


@partial(jax.jit, static_argnums=(3, 4))
def _pack_scatter(users, items, padrow, num_users, blk):
    lw = blk // BITS_PER_LANE
    b = items // blk
    j = items - b * blk
    lane = b * lw + (j % lw)
    bit = j // lw
    packed = jnp.zeros((num_users, padrow.shape[0]), dtype=jnp.int32).at[
        users, lane].add(jnp.int32(1) << bit, mode="drop")
    return packed | padrow[None, :]


def pack_history_device(offsets, flat_items, num_users, num_items):
    """Device-side history pack (one XLA scatter instead of a host loop)."""
    blk = block_size(num_items)
    counts = np.diff(np.asarray(offsets)).astype(np.int64)
    users = np.repeat(np.arange(num_users, dtype=np.int32), counts)
    return _pack_scatter(jnp.asarray(users),
                         jnp.asarray(flat_items, dtype=jnp.int32),
                         jnp.asarray(pad_row(num_items)),
                         num_users, blk)


@partial(jax.jit, static_argnums=(3, 4, 5))
def extend_tables(w_i, v_u, v_i, u_pad, i_pad, table_bf16=False):
    """[U,F]/[I,F]/[I] -> [U_pad,128] (col F = 1) and [I_pad,128] (col F = w_i)."""
    F = v_u.shape[1]
    U, I = v_u.shape[0], v_i.shape[0]
    tu = jnp.zeros((u_pad, LANES), jnp.float32)
    tu = tu.at[:U, :F].set(v_u)
    tu = tu.at[:U, F].set(1.0)
    ti = jnp.zeros((i_pad, LANES), jnp.float32)
    ti = ti.at[:I, :F].set(v_i)
    ti = ti.at[:I, F].set(w_i)
    if table_bf16:
        return tu.astype(jnp.bfloat16), ti.astype(jnp.bfloat16)
    return tu, ti


def extract_tables(tab_u, tab_i, num_users, num_items, factors):
    v_u = tab_u[:num_users, :factors].astype(jnp.float32)
    v_i = tab_i[:num_items, :factors].astype(jnp.float32)
    w_i = tab_i[:num_items, factors].astype(jnp.float32)
    return w_i, v_u, v_i


def make_records_grouped(u, i, sw, num_users, num_items, batch_size, chunk):
    """Fit-time epoch layout: pack the RAW interaction columns into int32
    ``[u, i, bits(sw), bits(valid)]`` records GROUPED by (user block, item
    block), with each group's run padded to whole chunks (and the tail to
    whole batches) by invalid guard records.

    Returns ``(rec [n_pad, 4], group [n_pad], chunkids [nb, nT],
    ublk [nb, nT], iblk [nb, nT])`` where ``group`` is each slot's (user
    block, item block) pair (tail guards get a group past the last so they
    sort last), ``chunkids`` is the interleaved chunk visit order (a
    permutation of rec's chunk blocks), and ``ublk``/``iblk`` are the
    STATIC block assignments of the chunk at each VISIT position.

    Two-level bucketing makes the kernel's per-chunk cost INDEPENDENT of
    catalog size: the positive one-hot contracts over one BLK item block
    (not I_pad) and the item-table update touches only that block's slice.
    Per-epoch randomization then needs only ONE segmented-shuffle sort —
    ``lax.sort((group, random, *record_cols), num_keys=2)`` — because rows
    may mix freely WITHIN their group without breaking chunk purity. Guard
    padding is ~NBU*NBLK*chunk rows once per FIT.
    """
    n = len(u)
    NBU = num_user_blocks(num_users)
    BLK = block_size(num_items)
    NBI = item_pad(num_items) // BLK
    NG = NBU * NBI
    nT = batch_size // chunk
    assert nT * chunk == batch_size
    u = np.asarray(u, dtype=np.int32)
    i = np.asarray(i, dtype=np.int32)
    sw = np.asarray(sw, dtype=np.float32)
    if NBU == 1:
        ubid = np.zeros(n, dtype=np.int32)
    else:
        assert user_block(num_users) == UBLK
        ubid = (u >> 10).astype(np.int32)
    gid = ubid * NBI + (i // BLK).astype(np.int32)
    order = np.argsort(gid, kind="stable")
    g_s = gid[order]
    cnt = np.bincount(g_s, minlength=NG)
    pad_cnt = (cnt + chunk - 1) // chunk * chunk
    nC = int(pad_cnt.sum()) // chunk
    nC_pad = (nC + nT - 1) // nT * nT
    n_pad = nC_pad * chunk

    guard_u = user_pad(num_users) - 1
    rec = np.empty((n_pad, 4), dtype=np.int32)
    rec[:, 0] = guard_u
    rec[:, 1] = -1         # never matches a one-hot column
    rec[:, 2] = 0          # bits of 0.0f
    rec[:, 3] = 0          # invalid
    src_start = np.cumsum(cnt) - cnt
    dst_start = np.cumsum(pad_cnt) - pad_cnt
    dst = (np.arange(n, dtype=np.int64)
           - src_start[g_s] + dst_start[g_s])
    rec[dst, 0] = u[order]
    rec[dst, 1] = i[order]
    rec[dst, 2] = sw[order].view(np.int32)
    rec[dst, 3] = np.full(n, 1.0, np.float32).view(np.int32)

    group = np.full(n_pad, NG, dtype=np.int32)
    group[:int(pad_cnt.sum())] = np.repeat(
        np.arange(NG, dtype=np.int32), pad_cnt)
    cpg = pad_cnt // chunk
    gid_c = np.repeat(np.arange(NG, dtype=np.int32), cpg)        # [nC]
    rank_c = np.arange(nC, dtype=np.int32) - np.repeat(
        np.cumsum(cpg) - cpg, cpg).astype(np.int32)
    # chunk INTERLEAVE: processing the group-contiguous layout in order
    # would train on block-sorted data (consecutive chunks hammering one
    # user/item block — a classic SGD quality killer). Order chunks by
    # (rank within group, group) so the scan cycles through all groups;
    # the kernel reads chunks through this permutation via a scalar-
    # prefetch index map, so no rows ever move.
    perm = np.full(nC_pad, nC_pad - 1, dtype=np.int32)
    perm[:nC] = np.lexsort((gid_c, rank_c)).astype(np.int32)
    ublk = np.zeros(nC_pad, dtype=np.int32)
    iblk = np.zeros(nC_pad, dtype=np.int32)
    ublk[:nC] = (gid_c // NBI)[perm[:nC]]
    iblk[:nC] = (gid_c % NBI)[perm[:nC]]
    nb = nC_pad // nT
    return (rec, group, perm.reshape(nb, nT), ublk.reshape(nb, nT),
            iblk.reshape(nb, nT))


def _kernel(cid_ref, rec_ref, wincols_ref, blk_ref, ublk_ref, iblk_ref,
            vu_in, vi_in, seed_ref, eta_ref, dreg_ref,
            vu_out, vi_out, ll_out,
            tab_u, tab_i, win_scratch, ll_acc, copy_sem,
            *, U_pad, UB, I_pad, F, M, C, BLK, NW, num_items, TBF16):
    LW = BLK // BITS_PER_LANE
    lg_lw = LW.bit_length() - 1
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

    u = rec_ref[:, 0:1]                              # [C,1] int32
    i = rec_ref[:, 1:2]
    sw = pltpu.bitcast(rec_ref[:, 2:3], jnp.float32)     # [C,1] sample weight
    valid = pltpu.bitcast(rec_ref[:, 3:4], jnp.float32)  # [C,1] 0.0/1.0
    eta = eta_ref[0]
    dreg = dreg_ref[0]                               # eta * 2 * alpha
    ubase = ublk_ref[t] * UB                         # user block (per chunk)
    ibase = iblk_ref[t] * BLK                        # positive-item block
    # NW negative windows per chunk, each drawn with probability
    # proportional to its real item count so negatives stay exactly
    # catalog-uniform (see make_fused_batch_fn for why NW == 1).
    blks = [blk_ref[t, w] for w in range(NW)]
    boffs = [b * BLK for b in blks]
    # each window's packed membership columns for this chunk's user block:
    # small sliced DMAs from the FULL per-fit lane-padded pack
    # ([NBLK*U_pad, 128], see `pack_win_cols`; block-major so every slice
    # is one CONTIGUOUS sublane span). Nothing item-windowed is built per
    # batch in XLA.
    wdmas = [pltpu.make_async_copy(
        wincols_ref.at[pl.ds(blks[w] * U_pad + ubase, UB), :],
        win_scratch.at[:, pl.ds(w * LANES, LANES)], copy_sem.at[w])
        for w in range(NW)]
    for c in wdmas:
        c.start()
    for c in wdmas:
        c.wait()

    # [NW*BLK, 128] window rows (concat of the NW table slices)
    tws = [tab_i[pl.ds(b, BLK), :] for b in boffs]
    tw = jnp.concatenate(tws, axis=0)
    if not TBF16:
        tw = tw.astype(jnp.bfloat16)
    W2 = NW * BLK

    # ---- one-hot gathers (MXU). The fit-time layout buckets every chunk's
    # rows into ONE user block (see `make_records_grouped`), so the user
    # one-hot contracts over UB rows, not U_pad. Validity masks keep
    # per-block pad slots out of the counts ----
    cols_u = jax.lax.broadcasted_iota(jnp.int32, (C, UB), 1) + ubase
    oh_uf = (u == cols_u).astype(jnp.float32) * valid             # [C,UB] f32
    oh_u = oh_uf.astype(jnp.bfloat16)
    tur = tab_u[pl.ds(ubase, UB), :]
    u_rows = jnp.dot(oh_u, tur if TBF16 else tur.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)          # [C,128]
    # window membership words for the chunk's users, via the SAME one-hot —
    # all NW windows in one pair of matmuls. The MXU runs bf16 passes, so
    # the 16-bit words go through as two EXACT 8-bit planes (0xFFFF in one
    # bf16 pass would round to 65536 and corrupt every bit)
    winblk = jnp.concatenate(
        [win_scratch[:, w * LANES:w * LANES + LW] for w in range(NW)],
        axis=1)                                                   # [UB,NW*LW]
    mlo = jnp.dot(oh_u, (winblk & 0xFF).astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    mhi = jnp.dot(oh_u, ((winblk >> 8) & 0xFF).astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    mask_rows = (mlo + 256.0 * mhi).astype(jnp.int32)             # [C,NW*LW]
    # positives are bucketed into THIS chunk's item block (two-level layout,
    # `make_records_grouped`): the one-hot contracts over BLK rows, not
    # I_pad — per-chunk cost is catalog-size independent. Guard rows carry
    # i = -1 and can never match a column.
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (C, BLK), 1) + ibase
    oh_i = (i == cols_i).astype(jnp.bfloat16)                     # [C,BLK]
    tpr = tab_i[pl.ds(ibase, BLK), :]
    tp = tpr if TBF16 else tpr.astype(jnp.bfloat16)
    i_rows = jnp.dot(oh_i, tp, preferred_element_type=jnp.float32)
    ut_ui = jnp.sum(u_rows * i_rows, axis=1, keepdims=True)       # [C,1]

    # ---- score the windows; pairwise utility over all window slots ----
    all_w = jax.lax.dot_general(
        u_rows.astype(jnp.bfloat16), tw,
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)  # [C,W2]
    pw = ut_ui - all_w                                                 # [C,W2]

    # ---- window membership from packed bits (int ops only; the blocked
    # 16-bit layout tiles per WINDOW, so extract each window separately) ----
    col1 = jax.lax.broadcasted_iota(jnp.int32, (C, BLK), 1)
    nonmem = jnp.concatenate([
        ((pltpu.repeat(mask_rows[:, w * LW:(w + 1) * LW],
                       BITS_PER_LANE, axis=1)
          >> (col1 >> lg_lw)) & 1) == 0
        for w in range(NW)], axis=1)                                   # [C,W2]
    # NOTE on window collisions (same block drawn twice): items then hold
    # two slots AND n_nonmem doubles — the per-item draw probability stays
    # uniform over the sampled multiset, so no correction is needed.

    u01 = (pltpu.bitcast(pltpu.prng_random_bits((C, W2)), jnp.int32)
           .astype(jnp.float32) * (2.0 ** -32) + 0.5)                  # U[0,1)

    if M == 1:
        # BPR: j = uniform window non-member (`rankfm.py:294-297`)
        key = jnp.where(nonmem, u01, -jnp.inf)
        mult_c = math.log(max(num_items - 1, 1)) / log_I
        mult = jnp.full((C, 1), mult_c, jnp.float32)
    else:
        viol = (pw < MARGIN) & nonmem                                  # [C,W2]
        violf = viol.astype(jnp.float32)
        nonmemf = nonmem.astype(jnp.float32)
        nv = jnp.sum(violf, axis=1, keepdims=True)                     # [C,1]
        n_nonmem = jnp.sum(nonmemf, axis=1, keepdims=True)

        # exact WARP draw count: sampled ~ min(M, 1 + Geometric(p))
        rbits = pltpu.bitcast(pltpu.prng_random_bits((C, LANES)), jnp.int32)
        r1 = rbits[:, 0:1].astype(jnp.float32) * (2.0 ** -32) + 0.5
        p = nv / jnp.maximum(n_nonmem, 1.0)
        p_c = jnp.clip(p, 1e-9, 1.0 - 1e-7)
        geo = jnp.floor(jnp.log(jnp.maximum(1.0 - r1, 1e-30))
                        / jnp.log(1.0 - p_c)) + 1.0
        geo = jnp.where(nv > 0, geo, jnp.float32(M))
        found = (nv > 0) & (geo <= M)                                  # [C,1]
        sampled = jnp.minimum(geo, jnp.float32(M))

        # uniform violator when found; else the reference's fallback —
        # "hardest of max_samples uniform draws" (`_rankfm.pyx:259-268`) —
        # emulated exactly: Bernoulli-subsample the window non-members at
        # rate M/n_nonmem (= M uniform draws in expectation) and take the
        # hardest inside the subset; items outside the subset ride 1e6
        # lower so the global hardest backstops an empty subset. (Both a
        # deterministic global argmax and a heavily-noised argmax measurably
        # hurt ranking quality — too concentrated / too diffuse.)
        pthr = jnp.float32(M) / jnp.maximum(n_nonmem, 1.0)        # [C,1]
        off_subset = (u01 >= pthr).astype(jnp.float32) * 1e6
        key = jnp.where(
            found,
            jnp.where(viol, u01, -jnp.inf),
            jnp.where(nonmem & ~viol, -pw - off_subset, -jnp.inf),
        )
        ratio = jnp.maximum(jnp.floor((num_items - 1) / sampled), 1.0)
        mult = jnp.log(ratio) / log_I                                  # [C,1]

    mx = jnp.max(key, axis=1, keepdims=True)                           # [C,1]
    oh_j = ((key == mx) & (key > -jnp.inf)).astype(jnp.float32) * valid
    cnt_j = jnp.sum(oh_j, axis=1, keepdims=True)
    oh_jb = (oh_j / jnp.maximum(cnt_j, 1.0)).astype(jnp.bfloat16)      # tie-split
    has_j = (cnt_j > 0).astype(jnp.float32)

    j_rows = jnp.dot(oh_jb, tw, preferred_element_type=jnp.float32)    # [C,128]
    pw_sel = ut_ui - jnp.sum(u_rows * j_rows, axis=1, keepdims=True)   # [C,1]

    # ---- outer derivative, log-likelihood (`_rankfm.pyx:269-276`) ----
    d = valid * has_j * sw * mult * jax.nn.sigmoid(-pw_sel)            # [C,1]
    ll_acc[0] += jnp.sum(valid * has_j * jax.nn.log_sigmoid(pw_sel))

    # ---- gradient rows + one-hot scatter-adds (MXU). Per-row touch
    # counts ride in SPARE gradient columns (col F of the user rows is
    # re-set to 1 after the update; col F+1 of the item rows is zeroed),
    # so no separate count matmul passes over the one-hots are needed ----
    lane = jax.lax.broadcasted_iota(jnp.int32, (C, LANES), 1)
    g_u = d * (i_rows - j_rows)
    g_u = jnp.where(lane == F, valid, g_u)       # col F carries touch count
    g_ip = d * u_rows                            # col F = d = bias grad
    g_ip = jnp.where(lane == F + 1, valid, g_ip)

    def _store_tab(val):
        if not TBF16:
            return val
        bits = pltpu.bitcast(pltpu.prng_random_bits(val.shape), jnp.uint32)
        return pltpu.stochastic_round(val, bits, target_dtype=jnp.bfloat16)

    scat_u = jax.lax.dot_general(oh_u, g_u.astype(jnp.bfloat16),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    count_u = scat_u[:, F:F + 1]                                  # [UB,1]
    tub = tab_u[pl.ds(ubase, UB), :].astype(jnp.float32)
    tab_u[pl.ds(ubase, UB), :] = _store_tab(
        tub * (1.0 - dreg * count_u) + eta * scat_u)
    tab_u[pl.ds(ubase, UB), F:F + 1] = jnp.ones(
        (UB, 1), jnp.bfloat16 if TBF16 else jnp.float32)

    zero_col = jnp.zeros((BLK, 1), jnp.bfloat16 if TBF16 else jnp.float32)
    scat_i = jax.lax.dot_general(oh_i, g_ip.astype(jnp.bfloat16),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    count_i = scat_i[:, F + 1:F + 2]                              # [BLK,1]
    tpf = tab_i[pl.ds(ibase, BLK), :].astype(jnp.float32)
    tab_i[pl.ds(ibase, BLK), :] = _store_tab(
        tpf * (1.0 - dreg * count_i) + eta * scat_i)
    tab_i[pl.ds(ibase, BLK), F + 1:F + 2] = zero_col

    g_j = jnp.where(lane == F + 1, valid * has_j, -g_ip)
    scat_j = jax.lax.dot_general(oh_jb, g_j.astype(jnp.bfloat16),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)   # [W2,128]
    for w in range(NW):
        sj = scat_j[w * BLK:(w + 1) * BLK, :]
        count_j = sj[:, F + 1:F + 2]
        twf = tab_i[pl.ds(boffs[w], BLK), :].astype(jnp.float32)
        tab_i[pl.ds(boffs[w], BLK), :] = _store_tab(
            twf * (1.0 - dreg * count_j) + eta * sj)
        tab_i[pl.ds(boffs[w], BLK), F + 1:F + 2] = zero_col

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
                        batch_size, chunk=128, table_bf16=False):
    """Build ``fn(tab_u, tab_i, rec, win_cols, chunkids, blk, ublk, iblk,
    seed, eta, dreg) -> (tab_u, tab_i, ll)`` running one minibatch fully
    fused.

    ``rec [n_pad,4] int32`` the WHOLE epoch's bucketed records
    (`make_records_grouped` + the per-epoch segmented shuffle); grid step t
    reads chunk ``chunkids[t]`` via a scalar-prefetch index map,
    ``win_cols [NBLK*U_pad, 128] int32`` EVERY block's packed membership
    columns for ALL users, block-major and lane-padded (`pack_win_cols`,
    built once per fit, HBM-resident; the kernel DMAs the [user-block x
    window-block] slice it needs and gathers rows via the user one-hot),
    ``chunkids [nT] int32`` this batch's chunk visit order (fit-time
    interleave so consecutive chunks cycle user/item blocks),
    ``blk [nT] int32`` each chunk's negative-window block id (PER-CHUNK
    windows: with one window per batch, large batches would starve the
    epoch of negative diversity — measured as a hard quality ceiling),
    ``ublk [nT] int32`` the visited chunks' user block ids,
    ``iblk [nT] int32`` the visited chunks' positive-item block ids.
    """
    U_pad = user_pad(num_users)
    UB = user_block(num_users)
    BLK = block_size(num_items)
    I_pad = item_pad(num_items)
    LW = BLK // BITS_PER_LANE
    # the kernel extracts membership bits with `col >> log2(LW)` — a non-pow2
    # LW would silently corrupt every membership test
    assert LW >= 8 and (LW & (LW - 1)) == 0, LW
    C = chunk
    assert batch_size % C == 0
    nT = batch_size // C

    # NW windows per chunk. With size-weighted window draws and uniform
    # slot selection over the UNION, NW > 1 skews per-item draw probability
    # toward items of larger blocks; the skew scales with the variance of
    # block sizes, so it is ONLY acceptable when blocks are mostly full
    # (large NBLK, one partial tail block). Small catalogs (<= 8 blocks,
    # where one 1024-item window already covers >= 1/8 of the catalog) use
    # NW = 1 for exactly catalog-uniform negatives; big catalogs trade the
    # tiny tail-block skew for 4x the negative coverage per chunk.
    NBLK_ = I_pad // BLK
    NW = 1 if NBLK_ <= 8 else min(4, NBLK_)
    tdt = jnp.bfloat16 if table_bf16 else jnp.float32
    kern = partial(_kernel, U_pad=U_pad, UB=UB, I_pad=I_pad, F=factors,
                   M=max_samples, C=C, BLK=BLK, NW=NW,
                   num_items=num_items, TBF16=table_bf16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,   # chunkids: the interleaved chunk visit order
        grid=(nT,),
        in_specs=[
            # the WHOLE epoch's record array; grid step t reads chunk
            # chunkids[t] — the fit-time interleave costs zero data movement
            pl.BlockSpec((C, 4), lambda t, cid: (cid[t], 0),
                         memory_space=pltpu.VMEM),                             # rec
            pl.BlockSpec(memory_space=pltpu.HBM),                              # win cols
            pl.BlockSpec(memory_space=pltpu.SMEM),                             # blk
            pl.BlockSpec(memory_space=pltpu.SMEM),                             # ublk
            pl.BlockSpec(memory_space=pltpu.SMEM),                             # iblk
            pl.BlockSpec(memory_space=pl.ANY),                              # vu_in
            pl.BlockSpec(memory_space=pl.ANY),                              # vi_in
            pl.BlockSpec(memory_space=pltpu.SMEM),                             # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),                             # eta
            pl.BlockSpec(memory_space=pltpu.SMEM),                             # dreg
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                              # vu_out
            pl.BlockSpec(memory_space=pl.ANY),                              # vi_out
            pl.BlockSpec((1, 1), lambda t, cid: (0, 0),
                         memory_space=pltpu.SMEM),                             # ll
        ],
        scratch_shapes=[
            pltpu.VMEM((U_pad, LANES), tdt),
            pltpu.VMEM((I_pad, LANES), tdt),
            pltpu.VMEM((UB, NW * LANES), jnp.int32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((U_pad, LANES), tdt),
            jax.ShapeDtypeStruct((I_pad, LANES), tdt),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        input_output_aliases={6: 0, 7: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
    )

    def fn(tab_u, tab_i, rec, win_cols, chunkids, blk, ublk, iblk,
           seed, eta, dreg):
        tu, ti, ll = call(chunkids, rec, win_cols, blk, ublk, iblk,
                          tab_u, tab_i, seed, eta, dreg)
        return tu, ti, ll[0, 0]

    return fn


@partial(jax.jit, static_argnums=(1, 2, 3))
def _pad_win_cols(packed_hist, u_pad, nblk, lw):
    u = packed_hist.shape[0]
    x = packed_hist.reshape(u, nblk, lw)
    x = jnp.pad(x, ((0, u_pad - u), (0, 0), (0, LANES - lw)))
    return jnp.transpose(x, (1, 0, 2)).reshape(nblk * u_pad, LANES)


def pack_win_cols(packed_hist, num_users, num_items):
    """[U, NBLK*LW] blocked history pack -> [NBLK*U_pad, 128] lane-padded
    window columns, built ONCE per fit, BLOCK-major so each block's columns
    form one contiguous row span. The fused kernel DMAs its chunk's
    [UB, 128] slice at row offset ``blk*U_pad + ubase`` — no per-batch
    windowed membership array is ever materialized in XLA, and the DMA is a
    contiguous sublane span (the known-fast Mosaic pattern)."""
    BLK = block_size(num_items)
    LW = BLK // BITS_PER_LANE
    NBLK = item_pad(num_items) // BLK
    return _pad_win_cols(packed_hist, user_pad(num_users), NBLK, LW)


def _epoch_body(batch_fn, num_users, num_items, batch_size, chunk):
    """Shared single-epoch logic: ONE segmented-shuffle sort (the layout is
    fixed at fit time, `make_records_grouped`) + a batch-order rotation +
    a scan whose body is ONLY the fused Pallas call."""
    BLK = block_size(num_items)
    I_pad = item_pad(num_items)
    NBLK = I_pad // BLK
    NW = 1 if NBLK <= 8 else min(4, NBLK)
    nT = batch_size // chunk
    # negatives must be uniform over the CATALOG: draw each window block
    # with probability proportional to its REAL item count (the tail block
    # is partial — a uniform block draw would oversample its items)
    real_cum = np.minimum(np.arange(1, NBLK + 1) * BLK, num_items)

    def one_epoch(tab_u, tab_i, win_cols, rec, group, cids, ublk, iblk, eta,
                  alpha, key, epoch):
        n_pad = rec.shape[0]
        nb = n_pad // batch_size
        key = jax.random.fold_in(key, epoch)
        kperm, ksamp, kblk, krot = jax.random.split(key, 4)
        # segmented shuffle: one stable 2-key payload sort re-randomizes row
        # order WITHIN each (user block, item block) group (group runs and
        # chunk->block assignments are static - no gathers, no per-batch
        # relayout)
        rnd = jax.random.bits(kperm, (n_pad,), jnp.uint32)
        _, _, c0, c1, c2, c3 = jax.lax.sort(
            (group, rnd, rec[:, 0], rec[:, 1], rec[:, 2], rec[:, 3]),
            num_keys=2)
        rec_s = jnp.stack([c0, c1, c2, c3], axis=1)     # [n_pad, 4]
        # rotate the batch processing order so the (static) chunk visit
        # order varies across epochs
        r = jax.random.randint(krot, (), 0, nb)
        cids_b = jnp.roll(cids, r, axis=0)
        ublk_b = jnp.roll(ublk, r, axis=0)
        iblk_b = jnp.roll(iblk, r, axis=0)
        seeds = jax.random.randint(ksamp, (nb,), 0, 2**31 - 1, dtype=jnp.int32)
        draw = jax.random.uniform(kblk, (nb, nT, NW),
                                  maxval=float(num_items))
        blks = jnp.searchsorted(
            jnp.asarray(real_cum, jnp.float32), draw, side="right"
        ).astype(jnp.int32)
        eta_arr = jnp.reshape(jnp.asarray(eta, jnp.float32), (1,))
        dreg_arr = eta_arr * (2.0 * jnp.asarray(alpha, jnp.float32))

        def body(carry, xs):
            tu, ti = carry
            cid_, seed_, blk_, ublk_, iblk_ = xs
            tu, ti, ll = batch_fn(tu, ti, rec_s, win_cols, cid_, blk_,
                                  ublk_, iblk_, jnp.reshape(seed_, (1,)),
                                  eta_arr, dreg_arr)
            return (tu, ti), ll

        (tab_u, tab_i), lls = jax.lax.scan(
            body, (tab_u, tab_i), (cids_b, seeds, blks, ublk_b, iblk_b))
        return tab_u, tab_i, jnp.sum(lls)

    return one_epoch


@lru_cache(maxsize=16)
def make_fused_epoch_fn(num_users, num_items, factors, max_samples, batch_size,
                        chunk=128, donate=True, table_bf16=False):
    """Whole-epoch driver around the fused kernel: one segmented-shuffle
    sort per epoch (the bucketed layout is fixed at fit time,
    `make_records_grouped`), then a `lax.scan` whose body is only the
    Pallas call.

    Signature: ``epoch_fn(tab_u, tab_i, win_cols, rec, group, chunkids,
    ublk, iblk, eta, alpha, key, epoch) -> (tab_u, tab_i, ll)`` with
    ``rec/group/chunkids/ublk/iblk`` from `make_records_grouped` and
    ``win_cols`` from `pack_win_cols` (all built once per fit); the
    per-epoch PRNG stream is ``fold_in(key, epoch)`` computed ON DEVICE so
    the caller passes the same base key every epoch (no per-epoch
    host-side PRNG dispatches).
    """
    batch_fn = make_fused_batch_fn(
        num_users, num_items, factors, max_samples, batch_size, chunk,
        table_bf16=table_bf16)
    one_epoch = _epoch_body(batch_fn, num_users, num_items, batch_size,
                            chunk)

    def epoch_fn(tab_u, tab_i, win_cols, rec, group, chunkids, ublk, iblk,
                 eta, alpha, key, epoch):
        return one_epoch(tab_u, tab_i, win_cols, rec, group, chunkids, ublk,
                         iblk, jnp.float32(eta), jnp.float32(alpha), key,
                         jnp.int32(epoch))

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(epoch_fn, donate_argnums=donate_argnums)
