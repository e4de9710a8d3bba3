"""Chained-epoch timing: run K fused epochs back-to-back with each epoch
consuming the previous epoch's tables (true data dependency), block once at
the end, and divide. This is how `fit` actually executes (pipelined
dispatch), so it sidesteps the per-call host<->device round trip that
poisons naive best-of-N timing over the tunneled device, AND the
epoch-variant comparison stays honest because every variant pays the same
harness cost.

Usage: python tools/probe_epoch_chain.py [chunk] [K]
Prints per-epoch ms for: full epoch (sort + scan), scan-only
(pre-shuffled), and the implied sort cost.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from rankfm_tpu.ops import fused

U, I, F, M = 6040, 3706, 20, 20
N = 746_849
BS = 32768
CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K = int(sys.argv[2]) if len(sys.argv) > 2 else 20

rng = np.random.default_rng(1492)
u = rng.integers(0, U, N).astype(np.int32)
i = rng.integers(0, I, N).astype(np.int32)
pairs = np.unique(np.stack([u, i], 1), axis=0)
counts = np.bincount(pairs[:, 0], minlength=U)
offsets = np.zeros(U + 1, np.int32)
offsets[1:] = np.cumsum(counts)
packed = fused.pack_history_device(offsets, pairs[:, 1].astype(np.int32), U, I)
win_cols = jax.block_until_ready(fused.pack_win_cols(packed, U, I))

rec_np, group_np, cids_np, ublk_np, iblk_np = fused.make_records_grouped(
    u, i, np.ones(N, np.float32), U, I, BS, CHUNK)
rec = jnp.asarray(rec_np)
group = jnp.asarray(group_np)
cids = jnp.asarray(cids_np)
ublk = jnp.asarray(ublk_np)
iblk = jnp.asarray(iblk_np)
n_pad = rec.shape[0]
nb, nT = ublk.shape
print(f"chunk={CHUNK} n_pad={n_pad} nb={nb} nT={nT} K={K}")

tu0, ti0 = fused.extend_tables(
    jnp.zeros(I), jnp.asarray(rng.normal(0, .1, (U, F)).astype(np.float32)),
    jnp.asarray(rng.normal(0, .1, (I, F)).astype(np.float32)),
    fused.user_pad(U), fused.item_pad(I))
key = jax.random.PRNGKey(0)


def chain(ep_fn, label, **extra):
    # NOTE: jax.block_until_ready returns at DISPATCH completion on the
    # tunneled axon backend — a host transfer (float(ll)) is the only
    # reliable fence here, same as what RankFM.fit's epoch log pays.
    tu, ti = tu0, ti0
    t0 = time.time()
    tu, ti, ll = ep_fn(tu, ti, win_cols, rec, group, cids, ublk, iblk,
                       0.1, 0.01, key, 0)
    float(ll)
    warm = time.time() - t0
    best = float("inf")
    for _ in range(3):
        tu, ti = tu0, ti0
        float(jnp.sum(tu))  # fence the input resets
        t0 = time.time()
        for e in range(K):
            tu, ti, ll = ep_fn(tu, ti, win_cols, rec, group, cids, ublk,
                               iblk, 0.1, 0.01, key, e)
        float(ll)
        best = min(best, (time.time() - t0) / K)
    print(f"{label:28s} warm={warm:6.1f}s  per-epoch={best*1000:7.2f} ms")
    return best


full = chain(fused.make_fused_epoch_fn(U, I, F, M, BS, chunk=CHUNK,
                                       donate=False), "full epoch (sort+scan)")
scan = chain(fused.make_fused_epoch_fn(U, I, F, M, BS, chunk=CHUNK,
                                       donate=False, pre_shuffled=True),
             "scan only (pre-shuffled)")
nch = nb * nT
print(f"implied sort: {1000 * (full - scan):.2f} ms/epoch; "
      f"scan {scan * 1e6 / nch:.2f} us/chunk over {nch} chunks; "
      f"rows/s at full: {N * 1 / full / 1e6:.1f} M")
