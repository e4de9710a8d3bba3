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

Side features fuse too (round 2): the small feature-factor tables
(``v_uf``/``v_if``+``w_if``, packed 128x128) live in VMEM, each chunk DMAs
its blocks' feature rows from HBM, representations ``x_uf@v_uf`` /
``x_if@v_if`` are per-block matmuls gathered through the SAME one-hots,
and the feature-table gradients are ``[C,*]^T @ [C,128]`` MXU contractions
with per-touch beta decay (`_rankfm.pyx:48-89, 279-326` feature terms; the
reference FM's missing uf x if cross term is subtracted explicitly).

Eligibility: factors <= 126, feature columns <= 128 per side, and the
tables + feature scratch fitting the VMEM budget. `RankFM.fit`
auto-dispatches.
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


UBLK = 1024  # default user-bucket cap; see pick_user_block


def user_block(num_users, ub=None):
    """User-block size: the whole (guarded) table when it is small, else
    the ``ub`` cap — chunks are then bucketed so each touches ONE block and
    the user-side one-hot matmuls contract over UB rows instead of U_pad."""
    return min(UBLK if ub is None else ub, _round_up(num_users + 1, 8))


def user_pad(num_users, ub=None):
    """User-table padding: at least one spare GUARD row, rounded to a whole
    number of user blocks."""
    return _round_up(num_users + 1, user_block(num_users, ub))


def num_user_blocks(num_users, ub=None):
    return user_pad(num_users, ub) // user_block(num_users, ub)


def pick_user_block(num_users, num_items, n, chunk):
    """Fused-kernel user-block rows (UB) for a fit: 1024.

    UB sets the contraction length of the user-side one-hot matmuls and
    the extent of the per-chunk user-table read-modify-write, and
    narrower IS faster — measured ML-1M epochs of 26.2 / 25.3 / 24.2 /
    24.7 ms at UB 1024 / 512 / 256 / 128 (round 4, 10-epoch pipelined).

    NEGATIVE RESULT (round 4, tools/probe_chunk_quality.py vs the C++
    sequential oracle): UB is NOT quality-neutral. Narrow blocks cluster
    each user's rows into fewer chunks, so more of a user's updates apply
    at the SAME stale weights — the same correlation mechanism that ruled
    out the 512-row chunk in round 3. Worst-seed deltas at the ML-1M
    headline: chunk256@UB256 −0.027 HR / −0.070 DCG (vs −0.010 / −0.021
    at UB1024); chunk512@UB256 −0.054 / −0.111. The flip side, for future
    tuning: chunk128@UB256 reaches ORACLE PARITY (−0.002 HR / −0.005 DCG)
    at 47x — a better quality-per-throughput point than chunk128@UB1024
    (42x) — so quality tracks rows-per-(chunk x user-band), not either
    knob alone. The default stays at the round-3-validated 1024; override
    via this hook only with fresh oracle gates."""
    return UBLK


def block_size(num_items):
    """Window block size: a POWER OF TWO in [128, 1024] (the kernel's bit
    extraction uses lane-index shifts, so BLK/16 must be a power of two)."""
    p = 1 << max(LANES.bit_length() - 1, (max(num_items, 1) - 1).bit_length())
    return min(MAX_BLK, p)


def item_pad(num_items):
    """Item-table padding: a whole number of window blocks."""
    return _round_up(max(num_items, 1), block_size(num_items))


def pick_chunk(batch_size, num_users, num_items, n):
    """Fused-kernel chunk rows. Must DIVIDE the batch (`make_records_grouped`
    lays out whole batches of whole chunks), so start from the largest
    halving of 256 that divides it — e.g. batch_size=640 gets 128, never a
    crashing 256 — then halve further while (user block x item block) guard
    padding would exceed ~15% of the epoch rows (smaller chunks waste less
    guard padding when the group count is large relative to n).

    256, not 512 (round 3): the chunk is the kernel's negative-WINDOW
    sharing unit — every row in a chunk draws from the same window — and
    512-row sharing measurably over-correlates the negative pushes
    (ML-1M headline at equal epochs vs the sequential oracle, worst seed:
    -0.039 HR / -0.082 DCG at 512 vs -0.010 / -0.021 at 256, while 128 only
    costs throughput: 42x vs 54x vs 60x; `tools/probe_chunk_quality.py`).

    Requires ``batch_size % 128 == 0`` (the fused eligibility gate enforces
    this) — otherwise no halving of 256 divides the batch."""
    assert batch_size % 128 == 0, \
        f"fused batch_size must be a multiple of 128, got {batch_size}"
    if batch_size <= 256:
        chunk = batch_size
    else:
        chunk = 256
        while chunk > 128 and batch_size % chunk:
            chunk //= 2
    ng = num_user_blocks(num_users) * (
        item_pad(num_items) // block_size(num_items))
    # halve only while the result stays >= 128 (e.g. 384 stops at 192)
    while chunk >= 256 and ng * chunk > 0.15 * max(n, 1):
        chunk //= 2
    return chunk


def window_block_cdf(num_items):
    """Cumulative REAL item count per window block (host-side, np).

    Negatives must be uniform over the CATALOG, so window blocks are drawn
    with probability proportional to their real item count — the tail
    block is partial, and a uniform block draw would oversample its items.
    Shared by the fused epoch and the XLA window step so the two paths can
    never drift in sampling semantics."""
    blk = block_size(num_items)
    nblk = item_pad(num_items) // blk
    return np.minimum(np.arange(1, nblk + 1) * blk, num_items)


def draw_window_blocks(key, shape, num_items, real_cum=None):
    """``shape``-shaped int32 window-block ids, catalog-size-weighted
    (see `window_block_cdf`)."""
    if real_cum is None:
        real_cum = window_block_cdf(num_items)
    return jnp.searchsorted(
        jnp.asarray(real_cum, jnp.float32),
        jax.random.uniform(key, shape, maxval=float(num_items)),
        side="right").astype(jnp.int32)


# catalogs beyond this many window blocks fall back to the XLA candidate
# step: per-chunk cost no longer depends on catalog size (two-level
# bucketing), so the cap is set by negative-window coverage quality and the
# tables fitting VMEM, not by compute
FUSED_NBLK_CAP = 64


def default_n_windows(nblk):
    """Negative windows per chunk: 1 below 9 blocks (exactly
    catalog-uniform draws), 4 beyond (coverage; see `make_fused_batch_fn`
    for the tail-block skew tradeoff). Overridable per-program via the
    ``n_windows`` argument of `make_fused_epoch_fn` — e.g. a wide-window
    tail on big catalogs."""
    return 1 if nblk <= 8 else min(4, nblk)


def _fused_vmem_bytes(num_users, num_items, width, nw, x_uf_any, x_if_any,
                      win_db=1, ub=None):
    """Total VMEM the fused kernel allocates: tables (``width`` bytes/elem)
    plus fixed scratch. Feature-block scratch is table-dtype; the packed
    factor tables themselves stay f32 but are one 64 KB tile each. Every
    window carries a [UB, 128] int32 membership-column scratch per DMA
    buffer (``win_db`` = 2 when the membership DMAs are double-buffered
    across grid steps, table dtype notwithstanding).

    The kernel allocates user_pad rows (guard row + whole user blocks),
    not a bare 8-row rounding — budgeting the smaller figure admitted
    near-boundary configs that then failed at Mosaic load."""
    rows = user_pad(num_users, ub) + item_pad(num_items)
    blk = block_size(num_items)
    s = rows * LANES * width
    s += win_db * nw * user_block(num_users, ub) * LANES * 4
    if x_uf_any:
        s += user_block(num_users, ub) * LANES * width + LANES * LANES * 4
    if x_if_any:
        s += (1 + nw) * blk * LANES * width + LANES * LANES * 4
    return s


def fused_table_mode(num_users, num_items, factors, x_uf_any, x_if_any,
                     vmem_table_budget=15 * 2**20, num_uf=0, num_if=0):
    """How the fused kernel can run this configuration.

    Returns ``'f32'`` (tables fit in f32), ``'bf16'`` (only the
    stochastically-rounded bf16 tables fit — validated at identical
    throughput/quality), or ``None`` (ineligible). The VMEM budget leaves
    ~1 MB of the ~16 MB/core for chunk temporaries, with tables AND
    fixed scratch (window membership columns, feature blocks) now counted
    honestly against it (the budget admits exactly the configurations the
    old 13 MB bound + undercounted rows did — e.g. the measured
    Instacart-with-features bf16 run at a true 14.1 MB). Beyond 8
    window blocks each chunk rotates 4 negative windows per draw (coverage;
    see `make_fused_batch_fn`); beyond `FUSED_NBLK_CAP` blocks the XLA
    candidate step takes over (see `RankFM.fit_partial`).

    Eligibility assumes single-buffered membership DMAs (``win_db=1``);
    `make_fused_batch_fn` upgrades to the double-buffered prefetch only
    when the extra scratch also fits, so no config loses eligibility.

    Side features fuse too (`_rankfm.pyx:48-89` feature terms) when each
    side has <= 128 feature columns: the per-block feature rows ride DMAs
    into fixed-size VMEM scratch, so they only charge the budget for that
    scratch, never for the full ``x_uf``/``x_if``.
    """
    if factors > LANES - 2:
        return None
    if (x_uf_any and num_uf > LANES) or (x_if_any and num_if > LANES):
        return None
    i_pad = item_pad(num_items)
    nblk = i_pad // block_size(num_items)
    if nblk > FUSED_NBLK_CAP:
        return None
    nw = default_n_windows(nblk)
    if _fused_vmem_bytes(num_users, num_items, 4, nw, x_uf_any,
                         x_if_any) <= vmem_table_budget:
        return 'f32'
    if _fused_vmem_bytes(num_users, num_items, 2, nw, x_uf_any,
                         x_if_any) <= vmem_table_budget:
        return 'bf16'
    return None


def fused_eligible(num_users, num_items, factors, x_uf_any, x_if_any,
                   vmem_table_budget=15 * 2**20, num_uf=0, num_if=0):
    """Can the fused kernel run this configuration (either table dtype)?"""
    return fused_table_mode(num_users, num_items, factors, x_uf_any,
                            x_if_any, vmem_table_budget,
                            num_uf=num_uf, num_if=num_if) is not None


def max_n_windows(num_users, num_items, table_bf16, x_uf_any=False,
                  x_if_any=False, vmem_budget=15 * 2**20):
    """Largest per-chunk negative-window count whose VMEM scratch fits.

    Besides the tables, each extra window costs ``UB x 128`` int32 of
    membership-column scratch (`win_scratch`) plus, with item features, a
    ``BLK x 128`` feature-block slot. Used to clamp the `tail_windows`
    override before building a wide-window program that Mosaic would
    reject for VMEM oversubscription.
    """
    width = 2 if table_bf16 else 4
    blk = block_size(num_items)
    fixed = (user_pad(num_users) + item_pad(num_items)) * LANES * width
    if x_uf_any:
        fixed += user_block(num_users) * LANES * width + LANES * LANES * 4
    if x_if_any:
        fixed += blk * LANES * width + LANES * LANES * 4  # positive block
    per_window = user_block(num_users) * LANES * 4
    if x_if_any:
        per_window += blk * LANES * width
    nblk = item_pad(num_items) // blk
    nw = (vmem_budget - fixed) // per_window
    return int(max(0, min(nw, nblk)))


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
    lane, bit = _pack_coords(items, blk)  # dtype-agnostic: works on jnp
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


@jax.jit
def extend_feature_tables(v_uf, w_if, v_if):
    """Pack the small feature-factor tables for the fused kernel.

    ``tab_uf [128, 128]`` holds ``v_uf [P,F]`` in cols 0..F-1 (col F stays
    0 so the gathered user row's constant-1 lane survives augmentation);
    ``tab_if [128, 128]`` holds ``v_if [Q,F]`` in cols 0..F-1 and ``w_if``
    in col F — so ``x_if_block @ tab_if`` yields both the item feature
    representation AND the feature bias ``x_if·w_if`` in one matmul.
    """
    P, F = v_uf.shape
    Q = v_if.shape[0]
    tuf = jnp.zeros((LANES, LANES), jnp.float32).at[:P, :F].set(v_uf)
    tif = jnp.zeros((LANES, LANES), jnp.float32).at[:Q, :F].set(v_if)
    tif = tif.at[:Q, F].set(w_if)
    return tuf, tif


def extract_feature_tables(tab_uf, tab_if, num_uf, num_if, factors):
    v_uf = tab_uf[:num_uf, :factors].astype(jnp.float32)
    v_if = tab_if[:num_if, :factors].astype(jnp.float32)
    w_if = tab_if[:num_if, factors].astype(jnp.float32)
    return v_uf, w_if, v_if


@partial(jax.jit, static_argnums=(1, 2))
def pad_feature_cols(x, rows_pad, bf16=False):
    """``x [N, K] -> [rows_pad, 128]`` zero-padded — the HBM-resident
    per-fit layout the kernel DMAs feature blocks from. In bf16 table mode
    the blocks are stored bf16 (halves the VMEM scratch; one-hot/indicator
    features are exact, dense values round once here)."""
    n, k = x.shape
    out = jnp.pad(jnp.asarray(x, jnp.float32),
                  ((0, rows_pad - n), (0, LANES - k)))
    return out.astype(jnp.bfloat16) if bf16 else out


def make_records_grouped(u, i, sw, num_users, num_items, batch_size, chunk,
                         ub=None):
    """Fit-time epoch layout: pack each interaction into ONE int32
    ``p0 = u_local | (i_local+1) << 10 | valid << 21`` (u_local/i_local are
    the indices WITHIN the row's user/item block; i_local+1 = 0 marks a
    guard) plus the sample-weight bits, GROUPED by (user block, item
    block), with each group's run padded to whole chunks (and the tail to
    whole batches) by invalid guard records. The 2-column record (round 4;
    was 4 columns of absolute indices) halves the per-epoch segmented-
    shuffle sort's payload traffic — the sort is ~17% of the ML-1M epoch —
    and the kernel's one-hots compare block-local indices directly.

    Returns ``(rec [n_pad, 2], group [n_pad], chunkids [nb, nT],
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
    NBU = num_user_blocks(num_users, ub)
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
        ubw = user_block(num_users, ub)
        assert ubw & (ubw - 1) == 0, ubw  # NBU > 1 implies ubw == cap (pow2)
        ubid = (u >> (ubw.bit_length() - 1)).astype(np.int32)
    gid = ubid * NBI + (i // BLK).astype(np.int32)
    order = np.argsort(gid, kind="stable")
    g_s = gid[order]
    cnt = np.bincount(g_s, minlength=NG)
    pad_cnt = (cnt + chunk - 1) // chunk * chunk
    nC = int(pad_cnt.sum()) // chunk
    nC_pad = (nC + nT - 1) // nT * nT
    # quantize the padded chunk count into ~3%-wide buckets (multiples of
    # max(nT, 2^(bits-6)) chunks): the compiled epoch program's shapes are
    # then STABLE under small interaction-count drift, so the AOT
    # executable cache keeps hitting when a production log grows a few
    # thousand rows between retrains (round 2 paid the full ~70 s Mosaic
    # recompile for a 0.4% row-count change, BENCH_r02). Extra slots are
    # invalid guard chunks — worst-case ~3% wasted kernel work.
    q = max(nT, 1 << max(0, nC_pad.bit_length() - 6))
    nC_pad = _round_up(_round_up(nC_pad, q), nT)
    n_pad = nC_pad * chunk

    # guard slots are all-zero: u_local 0 (one-hot killed by valid=0),
    # i_local+1 = 0 (never matches a column), sw bits 0, valid 0
    rec = np.zeros((n_pad, 2), dtype=np.int32)
    src_start = np.cumsum(cnt) - cnt
    dst_start = np.cumsum(pad_cnt) - pad_cnt
    dst = (np.arange(n, dtype=np.int64)
           - src_start[g_s] + dst_start[g_s])
    ubw = user_block(num_users, ub)
    u_loc = (u - ubid * ubw).astype(np.int32)
    i_loc1 = (i & (BLK - 1)) + 1                       # BLK is a pow2
    rec[dst, 0] = u_loc[order] | (i_loc1[order] << 10) | (1 << 21)
    rec[dst, 1] = sw[order].view(np.int32)

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


def unpack_record_cols(p0):
    """(u_local, i_local_plus_1, valid) from packed record column 0 —
    the layout `make_records_grouped` writes and the kernel inlines.
    Works on numpy and jnp arrays (test/emulator utility)."""
    return p0 & 1023, (p0 >> 10) & 2047, (p0 >> 21) & 1


def _kernel(cid_ref, rec_ref, wincols_ref, blk_ref, ublk_ref, iblk_ref,
            vu_in, vi_in, *rest,
            U_pad, UB, I_pad, F, M, C, BLK, NW, num_items, TBF16,
            HAS_UF=False, HAS_IF=False, WDB=1, SUB=1):
    # refs whose presence depends on the (static) feature flags — the
    # no-feature variants trace the exact same module as before
    it = iter(rest)
    xuf_hbm = next(it) if HAS_UF else None
    xif_hbm = next(it) if HAS_IF else None
    vuf_in = next(it) if HAS_UF else None
    vif_in = next(it) if HAS_IF else None
    seed_ref, eta_ref, dreg_ref = next(it), next(it), next(it)
    vu_out, vi_out = next(it), next(it)
    vuf_out = next(it) if HAS_UF else None
    vif_out = next(it) if HAS_IF else None
    ll_out = next(it)
    tab_u, tab_i, win_scratch = next(it), next(it), next(it)
    tab_uf = next(it) if HAS_UF else None
    tab_if = next(it) if HAS_IF else None
    xuf_scr = next(it) if HAS_UF else None
    xif_pos_scr = next(it) if HAS_IF else None
    xif_win_scr = next(it) if HAS_IF else None
    ll_acc, copy_sem, win_sem = next(it), next(it), next(it)

    LW = BLK // BITS_PER_LANE
    lg_lw = LW.bit_length() - 1
    t = pl.program_id(0)
    nT = pl.num_programs(0)    # GRID steps; each runs SUB sequential chunks
    log_I = math.log(num_items) if num_items > 1 else 1.0

    @pl.when(t == 0)
    def _load():
        cins = [pltpu.make_async_copy(vu_in, tab_u, copy_sem.at[0]),
                pltpu.make_async_copy(vi_in, tab_i, copy_sem.at[1])]
        if HAS_UF:
            cins.append(pltpu.make_async_copy(vuf_in, tab_uf,
                                              copy_sem.at[2]))
        if HAS_IF:
            cins.append(pltpu.make_async_copy(vif_in, tab_if,
                                              copy_sem.at[3]))
        for c in cins:
            c.start()
        for c in cins:
            c.wait()
        ll_acc[0] = 0.0

    # each window's packed membership columns for its chunk's user block:
    # small sliced DMAs from the FULL per-fit lane-padded pack
    # ([NBLK*U_pad, 128], see `pack_win_cols`; block-major so every slice
    # is one CONTIGUOUS sublane span). Nothing item-windowed is built per
    # batch in XLA. With WDB == 2 the buffers REVOLVE across VIRTUAL steps
    # (grid step t runs SUB sequential chunks, virtual step k = t*SUB + s):
    # step k issues step k+1's membership + record DMAs before doing its
    # own compute, hiding the ~512 KB/window HBM latency that used to sit
    # synchronously at the top of every step (start-then-wait). The write
    # into slot (k+1)%2 cannot race step k's reads of slot k%2, and the
    # reuse of a slot two steps later is ordered by the core's sequential
    # execution — the standard Mosaic revolving-buffer pattern.
    def win_dma(slot, step, w):
        return pltpu.make_async_copy(
            wincols_ref.at[
                pl.ds(blk_ref[step, w] * U_pad + ublk_ref[step] * UB, UB), :],
            win_scratch.at[slot, :, pl.ds(w * LANES, LANES)],
            win_sem.at[slot, w])

    def issue(slot, step):
        for w in range(NW):
            win_dma(slot, step, w).start()

    def _sub_round(k, slot, s):
        """One 256-row chunk: EXACTLY the SUB=1 grid step's semantics —
        same per-chunk PRNG stream (seeded at the virtual index), same
        window draws, same sequential table updates — so the training
        trajectory is bitwise independent of SUB (pinned by
        tests/test_fused.py::test_sub_rounds_bitwise_invariant, and
        measured at production shape by tools/probe_sub_rounds.py)."""
        pltpu.prng_seed(seed_ref[0] + k)
        eta = eta_ref[0]
        dreg = dreg_ref[0]                           # eta * 2 * alpha
        ubase = ublk_ref[k] * UB                     # user block (per chunk)
        ibase = iblk_ref[k] * BLK                    # positive-item block
        # NW negative windows per chunk, each drawn with probability
        # proportional to its real item count so negatives stay exactly
        # catalog-uniform (see make_fused_batch_fn for why NW == 1).
        blks = [blk_ref[k, w] for w in range(NW)]
        boffs = [b * BLK for b in blks]

        # feature blocks for this chunk: x_uf rows of the user block, x_if
        # rows of the positive block and of every negative window
        # (lane-padded f32, `pad_feature_cols`) — fixed-size slices
        # regardless of U/I
        fdmas = []
        if HAS_UF:
            fdmas.append(pltpu.make_async_copy(
                xuf_hbm.at[pl.ds(ubase, UB), :], xuf_scr, copy_sem.at[NW]))
        if HAS_IF:
            fdmas.append(pltpu.make_async_copy(
                xif_hbm.at[pl.ds(ibase, BLK), :], xif_pos_scr,
                copy_sem.at[NW + 1]))
            fdmas.extend(pltpu.make_async_copy(
                xif_hbm.at[pl.ds(boffs[w], BLK), :],
                xif_win_scr.at[pl.ds(w * BLK, BLK), :],
                copy_sem.at[NW + 2 + w]) for w in range(NW))
        for c in fdmas:
            c.start()
        for w in range(NW):
            win_dma(slot, k, w).wait()
        for c in fdmas:
            c.wait()

        # sub-round s's chunk: a STATIC slice of the grid step's pipelined
        # [SUB*C, 2] record block (the batch wrapper gathers records into
        # visit order, so block t holds chunks t*SUB .. t*SUB+SUB-1)
        p0 = rec_ref[s * C:(s + 1) * C, 0:1]         # [C,1] packed record
        sw = pltpu.bitcast(rec_ref[s * C:(s + 1) * C, 1:2],
                           jnp.float32)              # [C,1] sample weight
        u = p0 & 1023            # user index WITHIN the chunk's user block
        i1 = (p0 >> 10) & 2047   # item-in-block + 1 (0 = guard, no match)
        valid = ((p0 >> 21) & 1).astype(jnp.float32)     # [C,1] 0.0/1.0

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
        cols_u = jax.lax.broadcasted_iota(jnp.int32, (C, UB), 1)
        oh_uf = (u == cols_u).astype(jnp.float32) * valid             # [C,UB] f32
        oh_u = oh_uf.astype(jnp.bfloat16)
        tur = tab_u[pl.ds(ubase, UB), :]
        u_rows = jnp.dot(oh_u, tur if TBF16 else tur.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)          # [C,128]
        # window membership words for the chunk's users, via the SAME one-hot —
        # all NW windows in ONE matmul. The MXU runs bf16 passes, so the
        # 16-bit words go through as two EXACT 8-bit planes (0xFFFF in one
        # bf16 pass would round to 65536 and corrupt every bit); stacking the
        # planes along the output columns makes the contraction a full
        # 128-wide (2*LW) MXU tile instead of two half-wide passes (round 4)
        winblk = jnp.concatenate(
            [win_scratch[slot, :, w * LANES:w * LANES + LW] for w in range(NW)],
            axis=1)                                                   # [UB,NW*LW]
        planes = jnp.concatenate(
            [winblk & 0xFF, (winblk >> 8) & 0xFF], axis=1)        # [UB,2*NW*LW]
        mm = jnp.dot(oh_u, planes.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)          # [C,2*NW*LW]
        mask_rows = (mm[:, :NW * LW]
                     + 256.0 * mm[:, NW * LW:]).astype(jnp.int32)     # [C,NW*LW]
        # positives are bucketed into THIS chunk's item block (two-level layout,
        # `make_records_grouped`): the one-hot contracts over BLK rows, not
        # I_pad — per-chunk cost is catalog-size independent. Guard rows carry
        # i_local+1 = 0 and can never match a column.
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (C, BLK), 1)
        oh_i = (i1 - 1 == cols_i).astype(jnp.bfloat16)                # [C,BLK]
        tpr = tab_i[pl.ds(ibase, BLK), :]
        tp = tpr if TBF16 else tpr.astype(jnp.bfloat16)
        i_rows = jnp.dot(oh_i, tp, preferred_element_type=jnp.float32)

        # ---- side-feature representations (`_rankfm.pyx:48-89` feature
        # terms). The small packed factor tables (tab_uf/tab_if, VMEM) turn
        # each block's feature rows into representation rows by ONE matmul;
        # per-row reps are then gathered through the SAME one-hots. tab_if
        # col F carries w_if, so ifrep col F is the feature bias x_if·w_if
        # and rides the existing col-F bias pickup (user lane F == 1) ----
        if HAS_UF:
            xuf_blk = xuf_scr[:].astype(jnp.bfloat16)                 # [UB,128]
            ufrep_blk = jnp.dot(xuf_blk, tab_uf[:].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
            ufrep_rows = jnp.dot(oh_u, ufrep_blk.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)  # [C,128]
            xuf_rows = jnp.dot(oh_u, xuf_blk,
                               preferred_element_type=jnp.float32)    # [C,128]
            u_aug = u_rows + ufrep_rows
        else:
            u_aug = u_rows
        if HAS_IF:
            tif_b = tab_if[:].astype(jnp.bfloat16)
            xif_pos = xif_pos_scr[:].astype(jnp.bfloat16)             # [BLK,128]
            ifrep_pos = jnp.dot(xif_pos, tif_b,
                                preferred_element_type=jnp.float32)   # [BLK,128]
            ifrep_rows = jnp.dot(oh_i, ifrep_pos.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)  # [C,128]
            xif_rows_i = jnp.dot(oh_i, xif_pos,
                                 preferred_element_type=jnp.float32)  # [C,128]
            i_tot = i_rows + ifrep_rows
            xif_win = xif_win_scr[:].astype(jnp.bfloat16)             # [W2,128]
            ifrep_win = jnp.dot(xif_win, tif_b,
                                preferred_element_type=jnp.float32)   # [W2,128]
            tw_tot = (tw.astype(jnp.float32) + ifrep_win).astype(jnp.bfloat16)
        else:
            i_tot = i_rows
            tw_tot = tw

        ut_ui = jnp.sum(u_aug * i_tot, axis=1, keepdims=True)         # [C,1]
        if HAS_UF and HAS_IF:
            # the reference FM has NO user-feature x item-feature second-order
            # term (`rankfm.py:214-244` groups) — remove the cross term the
            # augmented dot introduced
            ut_ui -= jnp.sum(ufrep_rows * ifrep_rows, axis=1, keepdims=True)

        # ---- score the windows; pairwise utility over all window slots ----
        all_w = jax.lax.dot_general(
            u_aug.astype(jnp.bfloat16), tw_tot,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)  # [C,W2]
        if HAS_UF and HAS_IF:
            all_w -= jax.lax.dot_general(
                ufrep_rows.astype(jnp.bfloat16), ifrep_win.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
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
        if HAS_IF:
            j_tot = jnp.dot(oh_jb, tw_tot, preferred_element_type=jnp.float32)
        else:
            j_tot = j_rows
        ut_uj = jnp.sum(u_aug * j_tot, axis=1, keepdims=True)              # [C,1]
        if HAS_UF and HAS_IF:
            ut_uj -= jnp.sum(ufrep_rows * (j_tot - j_rows),
                             axis=1, keepdims=True)
        pw_sel = ut_ui - ut_uj                                             # [C,1]

        # ---- outer derivative, log-likelihood (`_rankfm.pyx:269-276`) ----
        d = valid * has_j * sw * mult * jax.nn.sigmoid(-pw_sel)            # [C,1]
        ll_acc[0] += jnp.sum(valid * has_j * jax.nn.log_sigmoid(pw_sel))

        # ---- gradient rows + one-hot scatter-adds (MXU). Per-row touch
        # counts ride in SPARE gradient columns (col F of the user rows is
        # re-set to 1 after the update; col F+1 of the item rows is zeroed),
        # so no separate count matmul passes over the one-hots are needed.
        # With side features the v_u gradient is the FULL utility derivative
        # (v_i + if_rep diff) and the v_i gradient is the augmented user
        # vector (v_u + uf_rep) — `_rankfm.pyx:279-326` ----
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, LANES), 1)
        g_u = d * (i_tot - j_tot)
        g_u = jnp.where(lane == F, valid, g_u)       # col F carries touch count
        g_ip = d * u_aug                             # col F = d = bias grad
        g_ip = jnp.where(lane == F + 1, valid, g_ip)

        def _store_tab(val):
            if not TBF16:
                return val
            bits = pltpu.bitcast(pltpu.prng_random_bits(val.shape), jnp.uint32)
            return pltpu.stochastic_round(val, bits, target_dtype=jnp.bfloat16)

        # per-touch L2 decay over k touches in the chunk, geometric-corrected:
        #   w <- c^k w + eta (1-c^k)/(k(1-c)) sum(g),  c = 1 - eta*2*alpha
        # (same form the feature tables use below). The naive linearization
        # (1 - dreg*k) goes NEGATIVE when dreg*k > 1 — a power user whose
        # chunk holds hundreds of rows, or a hot item drawn as the negative by
        # much of the chunk, would sign-flip and diverge where the reference's
        # per-touch (1-dreg)^k stays in (0, 1).
        cdec_r = jnp.maximum(1.0 - dreg, 1e-8)
        ldec_r = jnp.log(cdec_r)

        def _geo_row(cnt):
            ck = jnp.exp(cnt * ldec_r)
            denom = cnt * (1.0 - cdec_r)
            f = jnp.where(denom > 1e-12,
                          (1.0 - ck) / jnp.maximum(denom, 1e-12), 1.0)
            return ck, eta * f

        scat_u = jax.lax.dot_general(oh_u, g_u.astype(jnp.bfloat16),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        count_u = scat_u[:, F:F + 1]                                  # [UB,1]
        ck_u, gf_u = _geo_row(count_u)
        tub = tab_u[pl.ds(ubase, UB), :].astype(jnp.float32)
        tab_u[pl.ds(ubase, UB), :] = _store_tab(tub * ck_u + gf_u * scat_u)
        tab_u[pl.ds(ubase, UB), F:F + 1] = jnp.ones(
            (UB, 1), jnp.bfloat16 if TBF16 else jnp.float32)

        zero_col = jnp.zeros((BLK, 1), jnp.bfloat16 if TBF16 else jnp.float32)
        scat_i = jax.lax.dot_general(oh_i, g_ip.astype(jnp.bfloat16),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        count_i = scat_i[:, F + 1:F + 2]                              # [BLK,1]
        ck_i, gf_i = _geo_row(count_i)
        tpf = tab_i[pl.ds(ibase, BLK), :].astype(jnp.float32)
        tab_i[pl.ds(ibase, BLK), :] = _store_tab(tpf * ck_i + gf_i * scat_i)
        tab_i[pl.ds(ibase, BLK), F + 1:F + 2] = zero_col

        g_j = jnp.where(lane == F + 1, valid * has_j, -g_ip)
        scat_j = jax.lax.dot_general(oh_jb, g_j.astype(jnp.bfloat16),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)   # [W2,128]
        for w in range(NW):
            sj = scat_j[w * BLK:(w + 1) * BLK, :]
            count_j = sj[:, F + 1:F + 2]
            ck_j, gf_j = _geo_row(count_j)
            twf = tab_i[pl.ds(boffs[w], BLK), :].astype(jnp.float32)
            tab_i[pl.ds(boffs[w], BLK), :] = _store_tab(twf * ck_j + gf_j * sj)
            tab_i[pl.ds(boffs[w], BLK), F + 1:F + 2] = zero_col

        # ---- feature-factor table updates (dense, VMEM-resident). Each is a
        # [C,*]^T @ [C,128] MXU contraction: row q of the gradient is
        # sum_c x[c,q] * d_c * (payload rows). Per-touch beta decay counts a
        # touch per sample whose feature value is nonzero, on the positive
        # AND on the negative side — the reference's separate i/j feature
        # loops (`_rankfm.pyx:303-326`), linearized per chunk ----
        if HAS_UF or HAS_IF:
            touch = (valid * has_j).astype(jnp.bfloat16)              # [C,1]
            dregb = dreg_ref[1]                                       # eta*2*beta
            # feature columns are DENSE: one column can be touched by every
            # row of the chunk (e.g. a popular department). Same
            # geometric-corrected per-touch form as the row tables above,
            # validated against the reference by the XLA step
            # (`ops/training.py:_decay_apply`):
            #   w <- c^k w + eta (1-c^k)/(k(1-c)) sum(g),  c = 1 - eta*2*beta
            # preserving the reference's decay rate AND fixed point.
            cdec = jnp.maximum(1.0 - dregb, 1e-8)
            ldecay = jnp.log(cdec)
            n_ok = jnp.sum(valid * has_j)                             # scalar

            def _geo(cnt):
                ck = jnp.exp(cnt * ldecay)
                denom = cnt * (1.0 - cdec)
                f = jnp.where(denom > 1e-12,
                              (1.0 - ck) / jnp.maximum(denom, 1e-12), 1.0)
                return ck, eta * f
        if HAS_IF:
            # payload d*u_rows: cols 0..F-1 = d*v_u (v_if grad), col F = d
            # (w_if grad — user lane F is the constant 1)
            du = (d * u_rows).astype(jnp.bfloat16)
            xif_rows_j = jnp.dot(oh_jb, xif_win,
                                 preferred_element_type=jnp.float32)  # [C,128]
            g_if = (jax.lax.dot_general(
                        xif_rows_i.astype(jnp.bfloat16), du,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    - jax.lax.dot_general(
                        xif_rows_j.astype(jnp.bfloat16), du,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))          # [128,128]
            # v_if[q] is touched once per sample with a nonzero feature
            # DIFFERENCE (`_rankfm.pyx:321-326`); w_if[q] (col F) decays once
            # per sample for EVERY q — the reference's w_if loop has no
            # zero-skip (`_rankfm.pyx:283-286`)
            cnt_if = jax.lax.dot_general(
                (xif_rows_i != xif_rows_j).astype(jnp.bfloat16), touch,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)                   # [128,1]
            ck_v, gf_v = _geo(cnt_if)
            ck_w, gf_w = _geo(n_ok)
            lane_q = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
            decay_m = jnp.where(lane_q == F, ck_w, ck_v)
            gfac_m = jnp.where(lane_q == F, gf_w, gf_v)
            tab_if[:, :] = tab_if[:, :] * decay_m + gfac_m * g_if
        if HAS_UF:
            # v_uf grad payload: d * RAW (v_i[i] - v_i[j]) (`_rankfm.pyx`
            # v_uf lines use the raw item factors). Col F picks up
            # d*(w_i - w_j) garbage — zeroed so the score-side constant-1
            # pickup lane stays clean.
            gv = (d * (i_rows - j_rows)).astype(jnp.bfloat16)
            g_uf = jax.lax.dot_general(
                xuf_rows.astype(jnp.bfloat16), gv,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)                   # [128,128]
            cnt_uf = jax.lax.dot_general(
                (xuf_rows != 0).astype(jnp.bfloat16), touch,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)                   # [128,1]
            ck_u, gf_u = _geo(cnt_uf)
            tab_uf[:, :] = tab_uf[:, :] * ck_u + gf_u * g_uf
            tab_uf[:, F:F + 1] = jnp.zeros((LANES, 1), jnp.float32)

    # ---- drive the SUB sub-rounds (unrolled; SUB is static). With
    # WDB >= 2 every virtual step's DMAs are issued one step ahead; when
    # SUB is a WDB multiple the revolving slot is STATIC per sub-round
    # (k % WDB == s % WDB), so slot indexing compiles to constants. ----
    for s in range(SUB):
        k = t * SUB + s if SUB > 1 else t
        if WDB == 1:
            slot = 0
            issue(0, k)
        else:
            static_slots = SUB % WDB == 0
            slot = (s % WDB) if static_slots else jax.lax.rem(k, WDB)
            if s == 0:
                # virtual step 0 has no predecessor to prefetch it
                pl.when(t == 0)(lambda: issue(0, 0))
            if s < SUB - 1:
                # next sub-round of the SAME grid step: always exists
                nslot = ((s + 1) % WDB) if static_slots \
                    else jax.lax.rem(k + 1, WDB)
                issue(nslot, k + 1)
            else:
                # first sub-round of the NEXT grid step
                def _issue_next(k=k, static_slots=static_slots):
                    nslot = 0 if static_slots else jax.lax.rem(k + 1, WDB)
                    issue(nslot, k + 1)
                pl.when(t + 1 < nT)(_issue_next)
        _sub_round(k, slot, s)

    @pl.when(t == nT - 1)
    def _store():
        ll_out[0, 0] = ll_acc[0]
        couts = [pltpu.make_async_copy(tab_u, vu_out, copy_sem.at[0]),
                 pltpu.make_async_copy(tab_i, vi_out, copy_sem.at[1])]
        if HAS_UF:
            couts.append(pltpu.make_async_copy(tab_uf, vuf_out,
                                               copy_sem.at[2]))
        if HAS_IF:
            couts.append(pltpu.make_async_copy(tab_if, vif_out,
                                               copy_sem.at[3]))
        for c in couts:
            c.start()
        for c in couts:
            c.wait()


@lru_cache(maxsize=16)
def make_fused_batch_fn(num_users, num_items, factors, max_samples,
                        batch_size, chunk=128, table_bf16=False,
                        has_uf=False, has_if=False, n_windows=None,
                        ub=None, sub=1):
    """Build ``fn(tab_u, tab_i, rec, win_cols, chunkids, blk, ublk, iblk,
    seed, eta, dreg, x_uf, x_if, tab_uf, tab_if) ->
    (tab_u, tab_i, tab_uf, tab_if, ll)`` running one minibatch fully
    fused (the feature args/returns are None unless ``has_uf``/``has_if``;
    ``dreg`` is ``[eta*2*alpha, eta*2*beta]``).

    ``rec [n_pad,2] int32`` the WHOLE epoch's packed bucketed records
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
    U_pad = user_pad(num_users, ub)
    UB = user_block(num_users, ub)
    BLK = block_size(num_items)
    I_pad = item_pad(num_items)
    LW = BLK // BITS_PER_LANE
    # the kernel extracts membership bits with `col >> log2(LW)` — a non-pow2
    # LW would silently corrupt every membership test
    assert LW >= 8 and (LW & (LW - 1)) == 0, LW
    C = chunk
    assert batch_size % C == 0
    nT = batch_size // C
    # SUB chunks per grid step (sequential sub-rounds inside the kernel,
    # bitwise-identical trajectories to sub=1 — see `_sub_round`): the
    # grid shrinks to nT/SUB, amortizing the fixed per-grid-step cost.
    # Each grid step's record block is [SUB*C, 2] int32, lane-padded to
    # 128 in VMEM (SUB x 128 KB x 2 pipeline buffers at C=256) — clamp
    # SUB so the extra pipeline scratch keeps the total under the same
    # ~15 MB budget `fused_table_mode` admits configs against.
    # NW windows per chunk. With size-weighted window draws and uniform
    # slot selection over the UNION, NW > 1 skews per-item draw probability
    # toward items of larger blocks; the skew scales with the variance of
    # block sizes, so it is ONLY acceptable when blocks are mostly full
    # (large NBLK, one partial tail block). Small catalogs (<= 8 blocks,
    # where one 1024-item window already covers >= 1/8 of the catalog) use
    # NW = 1 for exactly catalog-uniform negatives; big catalogs trade the
    # tiny tail-block skew for 4x the negative coverage per chunk.
    NBLK_ = I_pad // BLK
    NW = default_n_windows(NBLK_) if n_windows is None else n_windows
    assert 1 <= NW <= NBLK_, (NW, NBLK_)
    tdt = jnp.bfloat16 if table_bf16 else jnp.float32
    width = 2 if table_bf16 else 4
    # one sub-round's record block — [C, 2] int32 lane-padded to 128,
    # double-buffered by the Pallas pipeline
    rec_unit = 2 * C * LANES * 4
    # double-buffer the per-chunk window-membership DMAs only when the
    # second set of [UB, 128] int32 buffers fits ALONGSIDE the minimum
    # (SUB=1) record pipeline; the SUB budget below is then carved from
    # the same WDB-inclusive base. Round-4 advisor finding: the two checks
    # used to pass individually (sub_cap against win_db=1, WDB ignoring
    # the SUB record scratch) while their SUM overflowed the 15 MB budget,
    # risking a Mosaic load failure with RANKFM_TPU_SUB>1 near the
    # boundary. (Kernel eligibility itself is gated at WDB=1, so tight
    # configs keep running, single-buffered.)
    WDB = 2 if _fused_vmem_bytes(
        num_users, num_items, width, NW, has_uf, has_if,
        win_db=2, ub=ub) + rec_unit <= 15 * 2**20 else 1
    base = _fused_vmem_bytes(num_users, num_items, width, NW,
                             has_uf, has_if, win_db=WDB, ub=ub)
    rec_budget = max(15 * 2**20 - base, rec_unit)
    sub_cap = max(1, int(rec_budget // rec_unit))
    SUB = next(s for s in range(min(max(sub, 1), nT, sub_cap), 0, -1)
               if nT % s == 0)
    kern = partial(_kernel, U_pad=U_pad, UB=UB, I_pad=I_pad, F=factors,
                   M=max_samples, C=C, BLK=BLK, NW=NW,
                   num_items=num_items, TBF16=table_bf16,
                   HAS_UF=has_uf, HAS_IF=has_if, WDB=WDB, SUB=SUB)

    in_specs = [
        # the batch's records in VISIT order (the wrapper gathers chunk
        # chunkids[k] to position k — one ~256 KB XLA gather per batch);
        # grid step t's pipelined block carries its SUB chunks
        pl.BlockSpec((SUB * C, 2), lambda t, cid: (t, 0),
                     memory_space=pltpu.VMEM),                             # rec
        pl.BlockSpec(memory_space=pltpu.HBM),                              # win cols
        pl.BlockSpec(memory_space=pltpu.SMEM),                             # blk
        pl.BlockSpec(memory_space=pltpu.SMEM),                             # ublk
        pl.BlockSpec(memory_space=pltpu.SMEM),                             # iblk
        pl.BlockSpec(memory_space=pl.ANY),                              # vu_in
        pl.BlockSpec(memory_space=pl.ANY),                              # vi_in
    ]
    if has_uf:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))              # x_uf
    if has_if:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))              # x_if
    if has_uf:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))              # vuf_in
    if has_if:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))              # vif_in
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.SMEM),                             # seed
        pl.BlockSpec(memory_space=pltpu.SMEM),                             # eta
        pl.BlockSpec(memory_space=pltpu.SMEM),                             # dreg
    ]

    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),                              # vu_out
        pl.BlockSpec(memory_space=pl.ANY),                              # vi_out
    ]
    out_shape = [
        jax.ShapeDtypeStruct((U_pad, LANES), tdt),
        jax.ShapeDtypeStruct((I_pad, LANES), tdt),
    ]
    # feature-table aliases: input index counts the scalar-prefetch arg
    aliases = {6: 0, 7: 1}
    nfi = 8  # next input index (after vu_in=6, vi_in=7 + prefetch offset)
    nfi += int(has_uf) + int(has_if)  # x_uf / x_if HBM inputs
    nfo = 2
    if has_uf:
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))             # vuf_out
        out_shape.append(jax.ShapeDtypeStruct((LANES, LANES), jnp.float32))
        aliases[nfi] = nfo
        nfi += 1
        nfo += 1
    if has_if:
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))             # vif_out
        out_shape.append(jax.ShapeDtypeStruct((LANES, LANES), jnp.float32))
        aliases[nfi] = nfo
        nfi += 1
        nfo += 1
    out_specs.append(pl.BlockSpec((1, 1), lambda t, cid: (0, 0),
                                  memory_space=pltpu.SMEM))                # ll
    out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))

    scratch_shapes = [
        pltpu.VMEM((U_pad, LANES), tdt),
        pltpu.VMEM((I_pad, LANES), tdt),
        pltpu.VMEM((WDB, UB, NW * LANES), jnp.int32),
    ]
    fdt = jnp.bfloat16 if table_bf16 else jnp.float32
    if has_uf:
        scratch_shapes.append(pltpu.VMEM((LANES, LANES), jnp.float32))  # tab_uf
    if has_if:
        scratch_shapes.append(pltpu.VMEM((LANES, LANES), jnp.float32))  # tab_if
    if has_uf:
        scratch_shapes.append(pltpu.VMEM((UB, LANES), fdt))             # xuf
    if has_if:
        scratch_shapes.append(pltpu.VMEM((BLK, LANES), fdt))            # xif pos
        scratch_shapes.append(pltpu.VMEM((NW * BLK, LANES), fdt))
    scratch_shapes += [
        pltpu.SMEM((1,), jnp.float32),
        pltpu.SemaphoreType.DMA((2 * NW + 2,)),
        pltpu.SemaphoreType.DMA((WDB, NW)),      # revolving window buffers
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,   # chunkids: the interleaved chunk visit order
        grid=(nT // SUB,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
    )

    def fn(tab_u, tab_i, rec, win_cols, chunkids, blk, ublk, iblk,
           seed, eta, dreg, x_uf=None, x_if=None, tab_uf=None, tab_if=None):
        # gather the batch's chunks into VISIT order (~256 KB): grid step
        # t's pipelined record block then holds chunks chunkids[t*SUB ..]
        # contiguously, so the kernel walks SUB chunks per step with
        # static slices (the old per-step BlockSpec index map could fetch
        # only ONE chunk per grid step). Chunk-granular rows (2 KB each,
        # via reshape) keep the gather HBM-friendly.
        rec = (rec.reshape(-1, 2 * C).at[chunkids]
               .get(mode="promise_in_bounds").reshape(-1, 2))
        fin = [chunkids, rec, win_cols, blk, ublk, iblk, tab_u, tab_i]
        if has_uf:
            fin.append(x_uf)
        if has_if:
            fin.append(x_if)
        if has_uf:
            fin.append(tab_uf)
        if has_if:
            fin.append(tab_if)
        fin += [seed, eta, dreg]
        out = call(*fin)
        tu, ti = out[0], out[1]
        k = 2
        tuf = tif = None
        if has_uf:
            tuf = out[k]
            k += 1
        if has_if:
            tif = out[k]
            k += 1
        ll = out[k]
        return tu, ti, tuf, tif, ll[0, 0]

    return fn


@partial(jax.jit, static_argnums=(1, 2, 3))
def _pad_win_cols(packed_hist, u_pad, nblk, lw):
    u = packed_hist.shape[0]
    x = packed_hist.reshape(u, nblk, lw)
    x = jnp.pad(x, ((0, u_pad - u), (0, 0), (0, LANES - lw)))
    return jnp.transpose(x, (1, 0, 2)).reshape(nblk * u_pad, LANES)


def pack_win_cols(packed_hist, num_users, num_items, ub=None):
    """[U, NBLK*LW] blocked history pack -> [NBLK*U_pad, 128] lane-padded
    window columns, built ONCE per fit, BLOCK-major so each block's columns
    form one contiguous row span. The fused kernel DMAs its chunk's
    [UB, 128] slice at row offset ``blk*U_pad + ubase`` — no per-batch
    windowed membership array is ever materialized in XLA, and the DMA is a
    contiguous sublane span (the known-fast Mosaic pattern)."""
    BLK = block_size(num_items)
    LW = BLK // BITS_PER_LANE
    NBLK = item_pad(num_items) // BLK
    return _pad_win_cols(packed_hist, user_pad(num_users, ub), NBLK, LW)


def make_shuffle_fn(num_users, num_items, ub=None):
    """Jitted segmented shuffle: ``(rec, group, key) -> rec_s`` — the same
    single-packed-key sort `_epoch_body` runs per epoch, exposed standalone
    so a fit can precompute R independent layouts ONCE and cycle them
    across epochs (`shuffle_layouts`), amortizing the ~3 ms ML-1M sort."""
    NBLK = item_pad(num_items) // block_size(num_items)
    NG = num_user_blocks(num_users, ub) * NBLK
    rnd_bits = 31 - int(NG + 1).bit_length()

    @jax.jit
    def shuffle(rec, group, key):
        n_pad = rec.shape[0]
        rnd = jax.random.bits(key, (n_pad,), jnp.uint32)
        keyv = (group << rnd_bits) | (rnd >> (32 - rnd_bits)).astype(jnp.int32)
        _, c0, c1 = jax.lax.sort((keyv, rec[:, 0], rec[:, 1]), num_keys=1)
        return jnp.stack([c0, c1], axis=1)

    return shuffle


def _epoch_body(batch_fn, num_users, num_items, batch_size, chunk,
                n_windows=None, ub=None, pre_shuffled=False):
    """Shared single-epoch logic: ONE segmented-shuffle sort (the layout is
    fixed at fit time, `make_records_grouped`) + a batch-order rotation +
    a scan whose body is ONLY the fused Pallas call.

    The shuffle is a SINGLE-key sort over the packed records: the group id
    rides the high bits of one int32 key, a truncated random draw the low
    ``31 - bits(NG)`` bits (ties fall back to the stable fit-time order —
    a vanishing within-group order bias at any realistic row count). One
    key + two payload columns instead of round-3's two keys + four
    payloads = ~half the sort traffic, measured ~1.3 ms off the 26 ms
    ML-1M epoch."""
    BLK = block_size(num_items)
    I_pad = item_pad(num_items)
    NBLK = I_pad // BLK
    NG = num_user_blocks(num_users, ub) * NBLK
    rnd_bits = 31 - int(NG + 1).bit_length()
    NW = default_n_windows(NBLK) if n_windows is None else n_windows
    nT = batch_size // chunk
    real_cum = window_block_cdf(num_items)

    def one_epoch(tab_u, tab_i, win_cols, rec, group, cids, ublk, iblk, eta,
                  alpha, key, epoch, x_uf=None, x_if=None, tab_uf=None,
                  tab_if=None, beta=0.0):
        n_pad = rec.shape[0]
        nb = n_pad // batch_size
        key = jax.random.fold_in(key, epoch)
        kperm, ksamp, kblk, krot = jax.random.split(key, 4)
        if pre_shuffled:
            # caller passes a pre-shuffled layout (shuffle_layouts cycling)
            rec_s = rec
        else:
            # segmented shuffle: one stable packed-key sort re-randomizes
            # row order WITHIN each (user block, item block) group (group
            # runs and chunk->block assignments are static - no gathers,
            # no per-batch relayout)
            rnd = jax.random.bits(kperm, (n_pad,), jnp.uint32)
            keyv = (group << rnd_bits) | (rnd >> (32 - rnd_bits)).astype(jnp.int32)
            _, c0, c1 = jax.lax.sort((keyv, rec[:, 0], rec[:, 1]), num_keys=1)
            rec_s = jnp.stack([c0, c1], axis=1)         # [n_pad, 2]
        # rotate the batch processing order so the (static) chunk visit
        # order varies across epochs
        r = jax.random.randint(krot, (), 0, nb)
        cids_b = jnp.roll(cids, r, axis=0)
        ublk_b = jnp.roll(ublk, r, axis=0)
        iblk_b = jnp.roll(iblk, r, axis=0)
        seeds = jax.random.randint(ksamp, (nb,), 0, 2**31 - 1, dtype=jnp.int32)
        blks = draw_window_blocks(kblk, (nb, nT, NW), num_items, real_cum)
        eta_arr = jnp.reshape(jnp.asarray(eta, jnp.float32), (1,))
        dreg_arr = jnp.concatenate([
            eta_arr * (2.0 * jnp.asarray(alpha, jnp.float32)),
            eta_arr * (2.0 * jnp.asarray(beta, jnp.float32)),
        ])

        def body(carry, xs):
            tu, ti, tuf, tif = carry
            cid_, seed_, blk_, ublk_, iblk_ = xs
            tu, ti, tuf, tif, ll = batch_fn(
                tu, ti, rec_s, win_cols, cid_, blk_, ublk_, iblk_,
                jnp.reshape(seed_, (1,)), eta_arr, dreg_arr,
                x_uf=x_uf, x_if=x_if, tab_uf=tuf, tab_if=tif)
            return (tu, ti, tuf, tif), ll

        (tab_u, tab_i, tab_uf, tab_if), lls = jax.lax.scan(
            body, (tab_u, tab_i, tab_uf, tab_if),
            (cids_b, seeds, blks, ublk_b, iblk_b))
        return tab_u, tab_i, tab_uf, tab_if, jnp.sum(lls)

    return one_epoch


def _dp_epoch_body(batch_fn, num_users, num_items, batch_size_dev, chunk,
                   axes, axis_sizes, n_windows=None, sync_every=1, ub=None,
                   pre_shuffled=False):
    """Per-DEVICE epoch body for the data-parallel fused path (run under
    ``shard_map`` over mesh ``axes``).

    Same segmented-shuffle + rotation + scan as `_epoch_body`, except each
    device visits only ITS pre-split share of every batch's chunks
    (``cids``/``ublk``/``iblk`` arrive as the local ``[nb, nTd]`` slabs of a
    device-major split — see `split_layout_for_mesh`) and the REPLICATED
    tables are re-merged by ONE delta-psum per sync group of
    ``sync_every`` batches (the same local-SGD lever as the XLA DP path's
    ``dp_sync_every``).

    PRNG discipline: the shuffle key and the batch-order rotation are
    SHARED across devices (every device re-sorts the same replicated
    record array — redundant compute, zero communication, and the chunk →
    record mapping stays consistent), while the negative-sampling and
    window-draw streams fold in the device index so devices draw
    independent negatives.
    """
    BLK = block_size(num_items)
    I_pad = item_pad(num_items)
    NBLK = I_pad // BLK
    NG = num_user_blocks(num_users, ub) * NBLK
    rnd_bits = 31 - int(NG + 1).bit_length()
    NW = default_n_windows(NBLK) if n_windows is None else n_windows
    nTd = batch_size_dev // chunk
    real_cum = window_block_cdf(num_items)

    def one_epoch(tab_u, tab_i, win_cols, rec, group, cids, ublk, iblk, eta,
                  alpha, key, epoch, x_uf=None, x_if=None, tab_uf=None,
                  tab_if=None, beta=0.0):
        nb = cids.shape[0]
        n_pad = rec.shape[0]
        dev = jax.lax.axis_index(axes[0])
        for ax, sz in zip(axes[1:], axis_sizes[1:]):
            dev = dev * sz + jax.lax.axis_index(ax)
        key = jax.random.fold_in(key, epoch)
        kperm, ksamp, kblk, krot = jax.random.split(key, 4)
        ksamp = jax.random.fold_in(ksamp, dev)
        kblk = jax.random.fold_in(kblk, dev)
        if pre_shuffled:
            rec_s = rec   # replicated pre-shuffled layout (shared across devices)
        else:
            rnd = jax.random.bits(kperm, (n_pad,), jnp.uint32)
            keyv = (group << rnd_bits) | (rnd >> (32 - rnd_bits)).astype(jnp.int32)
            _, c0, c1 = jax.lax.sort((keyv, rec[:, 0], rec[:, 1]), num_keys=1)
            rec_s = jnp.stack([c0, c1], axis=1)
        r = jax.random.randint(krot, (), 0, nb)
        cids_b = jnp.roll(cids, r, axis=0)
        ublk_b = jnp.roll(ublk, r, axis=0)
        iblk_b = jnp.roll(iblk, r, axis=0)
        seeds = jax.random.randint(ksamp, (nb,), 0, 2**31 - 1, dtype=jnp.int32)
        blks = draw_window_blocks(kblk, (nb, nTd, NW), num_items, real_cum)
        eta_arr = jnp.reshape(jnp.asarray(eta, jnp.float32), (1,))
        dreg_arr = jnp.concatenate([
            eta_arr * (2.0 * jnp.asarray(alpha, jnp.float32)),
            eta_arr * (2.0 * jnp.asarray(beta, jnp.float32)),
        ])

        # largest group size <= sync_every that divides the batch count
        k = max(d for d in range(1, max(1, min(sync_every, nb)) + 1)
                if nb % d == 0)
        ng = nb // k

        def regroup(a):
            return a.reshape((ng, k) + a.shape[1:])

        xs = tuple(map(regroup, (cids_b, seeds, blks, ublk_b, iblk_b)))

        def local(carry, x):
            tu, ti, tuf, tif = carry
            cid_, seed_, blk_, ublk_, iblk_ = x
            tu, ti, tuf, tif, ll = batch_fn(
                tu, ti, rec_s, win_cols, cid_, blk_, ublk_, iblk_,
                jnp.reshape(seed_, (1,)), eta_arr, dreg_arr,
                x_uf=x_uf, x_if=x_if, tab_uf=tuf, tab_if=tif)
            return (tu, ti, tuf, tif), ll

        def sync_group(carry, x):
            out, lls = jax.lax.scan(local, carry, x)
            # ONE table-sized collective per group: the sum of the
            # per-device deltas (f32 regardless of table dtype — a bf16
            # round of the summed delta would compound per sync). This
            # linearizes concurrent per-touch decay across devices — the
            # same approximation the chunked single-chip paths make.
            delta = jax.tree.map(
                lambda a, b: jax.lax.psum(
                    a.astype(jnp.float32) - b.astype(jnp.float32), axes),
                out, carry)
            merged = jax.tree.map(
                lambda b, d: (b.astype(jnp.float32) + d).astype(b.dtype),
                carry, delta)
            return merged, jnp.sum(lls)

        (tab_u, tab_i, tab_uf, tab_if), lls = jax.lax.scan(
            sync_group, (tab_u, tab_i, tab_uf, tab_if), xs)
        ll = jax.lax.psum(jnp.sum(lls), axes)
        return tab_u, tab_i, tab_uf, tab_if, ll

    return one_epoch


def split_layout_for_mesh(cids, ublk, iblk, n_dev):
    """Split a `make_records_grouped` visit order across ``n_dev`` devices.

    Each global batch's ``nT`` chunks are dealt contiguously to the
    devices (``nTd = nT // n_dev`` apiece — the fit-time interleave orders
    chunks by (rank within group, group), so every contiguous share still
    cycles through user/item blocks). Returns device-major ``[n_dev * nb,
    nTd]`` arrays whose leading axis shards over the mesh: device d's rows
    are ``[d*nb, (d+1)*nb)``, i.e. its share of every batch, in batch
    order.
    """
    nb, nT = cids.shape
    assert nT % n_dev == 0, (nT, n_dev)
    nTd = nT // n_dev

    def split(a):
        return np.ascontiguousarray(
            np.asarray(a).reshape(nb, n_dev, nTd).transpose(1, 0, 2)
            .reshape(n_dev * nb, nTd))

    return split(cids), split(ublk), split(iblk)


@lru_cache(maxsize=16)
def make_fused_epoch_fn(num_users, num_items, factors, max_samples, batch_size,
                        chunk=128, donate=True, table_bf16=False,
                        has_uf=False, has_if=False, n_windows=None,
                        ub=None, pre_shuffled=False, sub=1):
    """Whole-epoch driver around the fused kernel: one segmented-shuffle
    sort per epoch (the bucketed layout is fixed at fit time,
    `make_records_grouped`), then a `lax.scan` whose body is only the
    Pallas call.

    Signature: ``epoch_fn(tab_u, tab_i, win_cols, rec, group, chunkids,
    ublk, iblk, eta, alpha, key, epoch) -> (tab_u, tab_i, ll)`` — or,
    with ``has_uf``/``has_if``, the feature form ``epoch_fn(...,
    x_uf, x_if, tab_uf, tab_if, beta) -> (tab_u, tab_i, tab_uf, tab_if,
    ll)`` (HBM feature blocks from `pad_feature_cols`, packed factor
    tables from `extend_feature_tables`) — with
    ``rec/group/chunkids/ublk/iblk`` from `make_records_grouped` and
    ``win_cols`` from `pack_win_cols` (all built once per fit); the
    per-epoch PRNG stream is ``fold_in(key, epoch)`` computed ON DEVICE so
    the caller passes the same base key every epoch (no per-epoch
    host-side PRNG dispatches).
    """
    batch_fn = make_fused_batch_fn(
        num_users, num_items, factors, max_samples, batch_size, chunk,
        table_bf16=table_bf16, has_uf=has_uf, has_if=has_if,
        n_windows=n_windows, ub=ub, sub=sub)
    one_epoch = _epoch_body(batch_fn, num_users, num_items, batch_size,
                            chunk, n_windows=n_windows, ub=ub,
                            pre_shuffled=pre_shuffled)

    if has_uf or has_if:
        def epoch_fn(tab_u, tab_i, win_cols, rec, group, chunkids, ublk,
                     iblk, eta, alpha, key, epoch, x_uf, x_if, tab_uf,
                     tab_if, beta):
            return one_epoch(tab_u, tab_i, win_cols, rec, group, chunkids,
                             ublk, iblk, jnp.float32(eta),
                             jnp.float32(alpha), key, jnp.int32(epoch),
                             x_uf=x_uf, x_if=x_if, tab_uf=tab_uf,
                             tab_if=tab_if, beta=jnp.float32(beta))
    else:
        def epoch_fn(tab_u, tab_i, win_cols, rec, group, chunkids, ublk,
                     iblk, eta, alpha, key, epoch):
            out = one_epoch(tab_u, tab_i, win_cols, rec, group, chunkids,
                            ublk, iblk, jnp.float32(eta),
                            jnp.float32(alpha), key, jnp.int32(epoch))
            return out[0], out[1], out[4]

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(epoch_fn, donate_argnums=donate_argnums)
