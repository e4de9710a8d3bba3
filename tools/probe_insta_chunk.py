"""Probe: fused-epoch throughput at the Instacart shape vs CHUNK size.

`pick_chunk` clamps the chunk so (groups x chunk) guard padding stays under
15% of the epoch rows — at 10k users x 33k items that is 330 groups and the
chunk lands on 128. But the guard padding adds a CONSTANT ~ng/2 chunks
regardless of chunk size (pad per group ~ chunk/2, chunks = n/chunk + ng/2),
while the per-chunk FIXED cost (NW window-membership DMAs, 4-block j-scatter
table traffic) is what dominates this shape. Bigger chunks amortize it.

Times one epoch end-to-end (shuffle + scan) for chunk in {128, 256, 512}.
Run on TPU.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from rankfm_tpu.ops import fused

U, I, F, M = 10_000, 33_362, 50, 50
N = 552_348
BS = 32_768

rng = np.random.default_rng(1492)
u = rng.integers(0, U, N).astype(np.int32)
i = rng.integers(0, I, N).astype(np.int32)
pairs = np.unique(np.stack([u, i], 1), axis=0)
counts = np.bincount(pairs[:, 0], minlength=U)
offsets = np.zeros(U + 1, np.int32)
offsets[1:] = np.cumsum(counts)
packed = fused.pack_history_device(offsets, pairs[:, 1].astype(np.int32), U, I)
win_cols = jax.block_until_ready(fused.pack_win_cols(packed, U, I))

mode = fused.fused_table_mode(U, I, F, False, False)
table_bf16 = mode == "bf16"
print(f"table mode: {mode}; auto chunk would be "
      f"{fused.pick_chunk(BS, U, I, N)}")

tu, ti = fused.extend_tables(
    jnp.zeros(I), jnp.asarray(rng.normal(0, .1, (U, F)).astype(np.float32)),
    jnp.asarray(rng.normal(0, .1, (I, F)).astype(np.float32)),
    fused.user_pad(U), fused.item_pad(I), table_bf16)
key = jax.random.PRNGKey(0)

for chunk in (128, 256, 512):
    t0 = time.time()
    rec_np, group_np, cids_np, ublk_np, iblk_np = fused.make_records_grouped(
        u, i, np.ones(N, np.float32), U, I, BS, chunk)
    layout_s = time.time() - t0
    rec = jnp.asarray(rec_np)
    group = jnp.asarray(group_np)
    cids = jnp.asarray(cids_np)
    ublk = jnp.asarray(ublk_np)
    iblk = jnp.asarray(iblk_np)
    n_pad = rec.shape[0]

    ep = fused.make_fused_epoch_fn(U, I, F, M, BS, chunk=chunk, donate=False,
                                   table_bf16=table_bf16)
    t0 = time.time()
    out = jax.block_until_ready(
        ep(tu, ti, win_cols, rec, group, cids, ublk, iblk, 0.1, 0.01, key, 0))
    compile_s = time.time() - t0
    best = float("inf")
    for e in range(5):
        t0 = time.time()
        out = jax.block_until_ready(
            ep(tu, ti, win_cols, rec, group, cids, ublk, iblk,
               0.1, 0.01, key, e))
        best = min(best, time.time() - t0)
    n_chunks = n_pad // chunk
    print(f"chunk={chunk}: n_pad={n_pad} (+{(n_pad - N) / N * 100:.0f}% pad) "
          f"chunks/epoch={n_chunks} layout={layout_s:.1f}s "
          f"compile={compile_s:.0f}s epoch={best * 1000:.1f} ms "
          f"({N / best / 1e6:.1f}M rows/s)", flush=True)
