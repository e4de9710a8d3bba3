"""Fused-kernel tests. Host-side helpers run everywhere; the Mosaic kernel
itself needs TPU hardware and is exercised by the TPU parity drives (see
.claude/skills/verify) — here we gate it behind a skip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankfm_tpu.ops import fused


def _csr_from_sets(sets):
    offsets = np.zeros(len(sets) + 1, np.int32)
    offsets[1:] = np.cumsum([len(s) for s in sets])
    flat = (np.concatenate(sets).astype(np.int32) if offsets[-1]
            else np.zeros(0, np.int32))
    return offsets, flat


def _unpack(packed, num_items):
    """inverse of the blocked 16-bit pack, for layout verification"""
    blk = fused.block_size(num_items)
    lw = blk // fused.BITS_PER_LANE
    i_pad = fused.item_pad(num_items)
    U = packed.shape[0]
    out = np.zeros((U, i_pad), dtype=bool)
    for i in range(i_pad):
        b, j = divmod(i, blk)
        lane, bit = b * lw + (j % lw), j // lw
        out[:, i] = (packed[:, lane] >> bit) & 1
    return out


@pytest.mark.parametrize("num_items", [60, 128, 1000, 1024, 2500])
def test_pack_history_blocked_layout(num_items):
    U = 5
    rng = np.random.default_rng(0)
    sets = [np.sort(rng.choice(num_items, size=rng.integers(0, 30),
                               replace=False)) for _ in range(U)]
    offsets, flat = _csr_from_sets(sets)
    packed = fused.pack_history(offsets, flat, U, num_items)
    got = _unpack(packed, num_items)
    for u in range(U):
        for i in range(num_items):
            assert got[u, i] == (i in sets[u]), (u, i)
        # pad items are marked as members (never sampled as negatives)
        assert got[u, num_items:].all()
    assert packed.max() < 2**16 or packed.min() < 0  # 16 bits per lane


def test_pack_history_device_matches_host():
    U, num_items = 7, 300
    rng = np.random.default_rng(3)
    sets = [np.sort(rng.choice(num_items, size=rng.integers(0, 40),
                               replace=False)) for _ in range(U)]
    offsets, flat = _csr_from_sets(sets)
    host = fused.pack_history(offsets, flat, U, num_items)
    dev = np.asarray(fused.pack_history_device(offsets, flat, U, num_items))
    np.testing.assert_array_equal(host, dev)


def test_extend_extract_roundtrip():
    rng = np.random.default_rng(1)
    U, I, F = 11, 19, 7
    w_i = jnp.asarray(rng.normal(size=I).astype(np.float32))
    v_u = jnp.asarray(rng.normal(size=(U, F)).astype(np.float32))
    v_i = jnp.asarray(rng.normal(size=(I, F)).astype(np.float32))
    tu, ti = fused.extend_tables(w_i, v_u, v_i, 16, 128)
    # bias column conventions
    np.testing.assert_allclose(np.asarray(tu[:U, F]), 1.0)
    np.testing.assert_allclose(np.asarray(ti[:I, F]), np.asarray(w_i))
    # utility = 128-lane dot (host-side: on TPU the default jnp matmul runs
    # reduced-precision passes, which is NOT what this layout test checks)
    s = np.asarray(tu[:U]) @ np.asarray(ti[:I]).T
    want = np.asarray(v_u) @ np.asarray(v_i).T + np.asarray(w_i)[None, :]
    np.testing.assert_allclose(s, want, rtol=1e-5, atol=1e-5)
    w2, vu2, vi2 = fused.extract_tables(tu, ti, U, I, F)
    np.testing.assert_array_equal(np.asarray(w2), np.asarray(w_i))
    np.testing.assert_array_equal(np.asarray(vu2), np.asarray(v_u))
    np.testing.assert_array_equal(np.asarray(vi2), np.asarray(v_i))


def test_fused_eligible():
    assert fused.fused_eligible(6040, 3706, 20, False, False)
    assert not fused.fused_eligible(6040, 3706, 20, True, False)   # features
    assert not fused.fused_eligible(6040, 3706, 127, False, False)  # F too big
    assert not fused.fused_eligible(10_000_000, 1_000_000, 64, False, False)
    assert fused.fused_eligible(1000, 8192, 20, False, False)      # NBLK = 8
    # Instacart-scale catalogs fit via bf16 tables (NBLK <= FUSED_NBLK_CAP)
    assert fused.fused_table_mode(10_000, 33_362, 50, False, False) == 'bf16'
    # beyond the window-coverage cap -> XLA candidate step
    big = (fused.FUSED_NBLK_CAP + 1) * 1024
    assert not fused.fused_eligible(1000, big, 20, False, False)


def test_block_size_and_pad():
    assert fused.block_size(60) == 128
    assert fused.block_size(500) == 512
    assert fused.block_size(3706) == 1024
    assert fused.item_pad(3706) == 4096
    assert fused.item_pad(128) == 128


@pytest.mark.skipif(jax.devices()[0].platform not in ("tpu",),
                    reason="Mosaic kernel needs TPU hardware")
def test_fused_batch_trains():
    rng = np.random.default_rng(2)
    U, I, F, M, B = 64, 128, 8, 4, 128
    pairs = np.stack([np.arange(U).repeat(2), rng.integers(0, I, 2 * U)], 1).astype(np.int32)
    pairs = np.unique(pairs, axis=0)
    counts = np.bincount(pairs[:, 0], minlength=U)
    offsets = np.zeros(U + 1, np.int32)
    offsets[1:] = np.cumsum(counts)
    packed = jnp.asarray(fused.pack_history(offsets, pairs[:, 1], U, I))
    tu, ti = fused.extend_tables(
        jnp.zeros(I), jnp.asarray(rng.normal(0, 0.1, (U, F)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, (I, F)).astype(np.float32)),
        fused.user_pad(U), 128)
    n = len(pairs)
    epoch = fused.make_fused_epoch_fn(U, I, F, M, B, chunk=128, donate=False)
    layout = tuple(map(jnp.asarray, fused.make_records_grouped(
        pairs[:, 0], pairs[:, 1], np.ones(n, np.float32), U, I, B, 128)))
    win_cols = fused.pack_win_cols(packed, U, I)
    lls = []
    for e in range(10):
        tu, ti, ll = epoch(tu, ti, win_cols, *layout,
                           0.1, 0.01, jax.random.PRNGKey(0), e)
        lls.append(float(ll))
    assert np.isfinite(lls).all()
    assert lls[-1] > lls[0]  # log-likelihood improves


@pytest.mark.skipif(jax.devices()[0].platform not in ("tpu",),
                    reason="Mosaic kernel needs TPU hardware")
def test_full_history_users_get_no_updates():
    """adversarial membership check: when a user's history covers the whole
    catalog there are no legal negatives — the epoch's log-likelihood must be
    EXACTLY zero (this catches any bit-pack / mask-gather corruption, e.g.
    bf16 rounding of dense 16-bit words)"""
    U, I, F, M, B = 600, 128, 8, 5, 1024
    rng = np.random.default_rng(0)
    offsets = np.arange(U + 1, dtype=np.int32) * I
    flat = np.tile(np.arange(I, dtype=np.int32), U)
    packed = fused.pack_history_device(offsets, flat, U, I)
    tu, ti = fused.extend_tables(
        jnp.zeros(I),
        jnp.asarray(rng.normal(0, .1, (U, F)).astype(np.float32)),
        jnp.asarray(rng.normal(0, .1, (I, F)).astype(np.float32)),
        fused.user_pad(U), fused.item_pad(I))
    u = rng.integers(0, U, B).astype(np.int32)
    i = rng.integers(0, I, B).astype(np.int32)
    layout = tuple(map(jnp.asarray, fused.make_records_grouped(
        u, i, np.ones(B, np.float32), U, I, B, 128)))
    ep = fused.make_fused_epoch_fn(U, I, F, M, B, chunk=128, donate=False)
    win_cols = fused.pack_win_cols(packed, U, I)
    _, _, ll = ep(tu, ti, win_cols, *layout, 0.1, 0.01,
                  jax.random.PRNGKey(0), 0)
    assert float(ll) == 0.0


def test_grouped_records_layout_invariants():
    """fit-time grouped layout: every chunk's rows share one user block;
    every input row appears exactly once; pad slots are invalid guard
    records — and the invariants SURVIVE the per-epoch segmented shuffle
    (the 2-key sort the epoch body runs)"""
    U, I = 3000, 256            # 3 user blocks (UB=1024)
    B, C = 2048, 128
    NBU = fused.num_user_blocks(U)
    assert NBU == 3
    rng = np.random.default_rng(0)
    n = 3 * B - 300             # deliberately not a whole number of batches
    u = rng.integers(0, U, n).astype(np.int32)
    i = rng.integers(0, I, n).astype(np.int32)
    sw = rng.random(n).astype(np.float32) + 0.5
    rec, group, cids, ublk, iblk = fused.make_records_grouped(
        u, i, sw, U, I, B, C)
    n_pad = rec.shape[0]
    assert n_pad % B == 0
    nb, nT = ublk.shape
    assert nb == n_pad // B and nT == B // C
    assert iblk.shape == ublk.shape == cids.shape
    BLK = fused.block_size(I)
    # the interleave visits every chunk that holds real rows exactly once
    has_real = (rec[:, 3].view(np.float32) == 1.0).reshape(-1, C).any(axis=1)
    visited = np.bincount(cids.reshape(-1), minlength=n_pad // C)
    assert (visited[has_real] == 1).all()

    def check(rec_flat):
        valid = rec_flat[:, 3].view(np.float32) == 1.0
        # chunk purity: at every VISIT position, the visited chunk's valid
        # rows match that position's static user/item block assignment
        cid_f = cids.reshape(-1)
        ub_f, ib_f = ublk.reshape(-1), iblk.reshape(-1)
        for p in range(n_pad // C):
            c = cid_f[p]
            seg = rec_flat[c * C:(c + 1) * C]
            segv = seg[valid[c * C:(c + 1) * C]]
            if len(segv):
                assert ((segv[:, 0] >> 10) == ub_f[p]).all(), p
                assert ((segv[:, 1] // BLK) == ib_f[p]).all(), p
        # guard rows can never match a positive one-hot column
        assert (rec_flat[~valid][:, 1] == -1).all()
        # conservation incl. sample weights
        got = rec_flat[valid][:, :3]
        want = np.stack([u, i, sw.view(np.int32)], 1)
        order_g = np.lexsort((got[:, 2], got[:, 1], got[:, 0]))
        order_w = np.lexsort((want[:, 2], want[:, 1], want[:, 0]))
        np.testing.assert_array_equal(got[order_g], want[order_w])

    check(rec)
    # the per-epoch segmented shuffle preserves every invariant
    rnd = jax.random.bits(jax.random.PRNGKey(5), (n_pad,), jnp.uint32)
    _, _, c0, c1, c2, c3 = jax.lax.sort(
        (jnp.asarray(group), rnd, *(jnp.asarray(rec[:, k]) for k in range(4))),
        num_keys=2)
    shuffled = np.stack([np.asarray(c) for c in (c0, c1, c2, c3)], 1)
    check(shuffled)
    assert not np.array_equal(shuffled, rec)  # it did shuffle
