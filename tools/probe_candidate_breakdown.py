"""Probe: decompose the candidate-step epoch at Instacart shape
(10k users x 33k items, M=50) by timing ablated variants fit-style
(chained epoch calls, one sync — per-call timings are tunnel-RTT noise).

Variants:
  baseline      — the shipped candidate epoch (post_reject + pallas scatter)
  no_pallas     — .at[].add scatters instead of the Pallas table update
  fixed_cands   — candidate indices forced to 0 (removes the [B*M] row
                  gather + per-candidate scoring memory traffic; WRONG
                  results, timing only)
  no_reject     — post_reject membership tests off
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from rankfm_tpu.ops import training as T

U, I, F, M = 10_000, 33_362, 50, 50
N = 552_348
BS = 8192
rng = np.random.default_rng(0)
u = rng.integers(0, U, N).astype(np.int32)
i = rng.integers(0, I, N).astype(np.int32)
pairs = np.unique(np.stack([u, i], 1), axis=0)
counts = np.bincount(pairs[:, 0], minlength=U)
offsets = np.zeros(U + 1, np.int32)
offsets[1:] = np.cumsum(counts)
flat = pairs[:, 1].astype(np.int32)

from rankfm_tpu.ops.negatives import build_bitmap_words
hist = {"offsets": jnp.asarray(offsets), "flat": jnp.asarray(flat),
        "bitmap": jnp.asarray(build_bitmap_words(offsets, flat, U, I))}

n_pad = (N + BS - 1) // BS * BS
up = np.zeros(n_pad, np.int32); ip = np.zeros(n_pad, np.int32)
sw = np.zeros(n_pad, np.float32)
up[:N] = u; ip[:N] = i; sw[:N] = 1.0
u_d, i_d, sw_d = jnp.asarray(up), jnp.asarray(ip), jnp.asarray(sw)

w0 = {
    "w_i": jnp.zeros(I), "w_if": jnp.zeros(1),
    "v_u": jnp.asarray(rng.normal(0, .1, (U, F)).astype(np.float32)),
    "v_i": jnp.asarray(rng.normal(0, .1, (I, F)).astype(np.float32)),
    "v_uf": jnp.zeros((1, F)), "v_if": jnp.zeros((1, F)),
}
x_uf = jnp.zeros((U, 1)); x_if = jnp.zeros((I, 1))
key = jax.random.PRNGKey(0)


def run(name, **kw):
    ep = T.make_epoch_fn(I, M, False, False, BS, donate=False,
                         sampler="bitmap", step_kind="candidate", **kw)
    w = {k: v.copy() for k, v in w0.items()}
    t0 = time.time()
    w, ll = ep(w, x_uf, x_if, hist, u_d, i_d, sw_d, N, 0.1, 0.01, 0.1, key, 0)
    float(ll)
    comp = time.time() - t0
    E = 6
    t0 = time.time()
    for e in range(E):
        w, ll = ep(w, x_uf, x_if, hist, u_d, i_d, sw_d, N, 0.1, 0.01, 0.1,
                   key, e)
    float(ll)
    dt = (time.time() - t0) / E
    print(f"{name:14s} {dt*1000:7.1f} ms/epoch  "
          f"({N/dt/1e6:.2f} M rows/s, {N/dt/197_267:.1f}x ref; "
          f"compile {comp:.0f}s)", flush=True)
    return dt


run("baseline", pallas_scatter=True, post_reject=True)
run("no_pallas", pallas_scatter=False, post_reject=True)
run("no_reject", pallas_scatter=True, post_reject=False)
T._PROBE_FIXED_CANDS = True
try:
    # sample_rounds=7 only perturbs the lru_cache key so the ablated step
    # compiles fresh (the flag is read at trace time)
    run("fixed_cands", pallas_scatter=True, post_reject=True,
        sample_rounds=7)
finally:
    T._PROBE_FIXED_CANDS = False
