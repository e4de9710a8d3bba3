"""Probe: decompose the fused-epoch wall time into (segmented shuffle) vs
(kernel scan), and measure compile times of each piece. ML-1M bench shape.

Run on TPU. Prints per-epoch ms for: full epoch_fn, shuffle-only, scan-only,
plus compile seconds for each jit.
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

rng = np.random.default_rng(1492)
u = rng.integers(0, U, N).astype(np.int32)
i = rng.integers(0, I, N).astype(np.int32)
pairs = np.unique(np.stack([u, i], 1), axis=0)
counts = np.bincount(pairs[:, 0], minlength=U)
offsets = np.zeros(U + 1, np.int32)
offsets[1:] = np.cumsum(counts)
packed = fused.pack_history_device(offsets, pairs[:, 1].astype(np.int32), U, I)
win_cols = jax.block_until_ready(fused.pack_win_cols(packed, U, I))

t0 = time.time()
rec_np, group_np, cids_np, ublk_np, iblk_np = fused.make_records_grouped(
    u, i, np.ones(N, np.float32), U, I, BS, CHUNK)
host_layout_s = time.time() - t0
rec = jnp.asarray(rec_np)
group = jnp.asarray(group_np)
cids = jnp.asarray(cids_np)
ublk = jnp.asarray(ublk_np)
iblk = jnp.asarray(iblk_np)
n_pad = rec.shape[0]
nb, nT = ublk.shape
print(f"host layout: {host_layout_s*1000:.0f} ms once per fit; "
      f"n_pad={n_pad} (+{n_pad - N} pad rows) nb={nb} nT={nT}")

tu, ti = fused.extend_tables(
    jnp.zeros(I), jnp.asarray(rng.normal(0, .1, (U, F)).astype(np.float32)),
    jnp.asarray(rng.normal(0, .1, (I, F)).astype(np.float32)),
    fused.user_pad(U), fused.item_pad(I))
key = jax.random.PRNGKey(0)


def timeit(fn, *args, reps=5):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    return compile_s, best, out


# ---- full epoch ----
ep = fused.make_fused_epoch_fn(U, I, F, M, BS, chunk=CHUNK, donate=False)
c, t, _ = timeit(lambda: ep(tu, ti, win_cols, rec, group, cids, ublk,
                            iblk, 0.1, 0.01, key, 0))
print(f"full epoch:   compile={c:6.1f}s  best={t*1000:7.1f} ms")


# ---- shuffle only (single packed key, round 4 — see fused._epoch_body) ----
NG_ = fused.num_user_blocks(U) * (fused.item_pad(I) // fused.block_size(I))
RND_BITS = 31 - int(NG_ + 1).bit_length()


@jax.jit
def shuffle_only(rec, group, key):
    rnd = jax.random.bits(key, (n_pad,), jnp.uint32)
    keyv = (group << RND_BITS) | (rnd >> (32 - RND_BITS)).astype(jnp.int32)
    _, c0, c1 = jax.lax.sort((keyv, rec[:, 0], rec[:, 1]), num_keys=1)
    return jnp.stack([c0, c1], axis=1)


c, t, rec_b = timeit(lambda: shuffle_only(rec, group, key))
print(f"shuffle only: compile={c:6.1f}s  best={t*1000:7.1f} ms")

# ---- scan only (pre-shuffled) ----
NBLK = fused.item_pad(I) // fused.block_size(I)

batch_fn = fused.make_fused_batch_fn(U, I, F, M, BS, CHUNK)
NW = fused.default_n_windows(NBLK)
seeds = jax.random.randint(key, (nb,), 0, 2**31 - 1, dtype=jnp.int32)
blks = jax.random.randint(key, (nb, nT, NW), 0, NBLK, dtype=jnp.int32)


@jax.jit
def scan_only(tu, ti, rec_s, cids, ublk, iblk, seeds, blks):
    eta = jnp.asarray([0.1], jnp.float32)
    dreg = jnp.concatenate([eta * 0.02, eta * 0.02])

    def body(carry, xs):
        tu, ti = carry
        cid_, seed_, blk_, ublk_, iblk_ = xs
        tu, ti, _, _, ll = batch_fn(tu, ti, rec_s, win_cols, cid_, blk_,
                                    ublk_, iblk_, jnp.reshape(seed_, (1,)),
                                    eta, dreg)
        return (tu, ti), ll

    (tu, ti), lls = jax.lax.scan(body, (tu, ti),
                                 (cids, seeds, blks, ublk, iblk))
    return tu, ti, jnp.sum(lls)


c, t, _ = timeit(lambda: scan_only(tu, ti, rec_b, cids, ublk, iblk, seeds, blks))
print(f"scan only:    compile={c:6.1f}s  best={t*1000:7.1f} ms")
n_chunks = nb * nT
print(f"# chunks/epoch={n_chunks} us/chunk={t*1e6/n_chunks:.1f}")
