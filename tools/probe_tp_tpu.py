"""Explicit-TP overhead measured ON THE REAL TPU via a (1,1) mesh.

The 8-virtual-device CPU mesh bounds the explicit table-parallel
schedule's PARTITIONING overhead (+30% window / +83% candidate,
`probe_mesh_scaling.py`), but says nothing about how the TP machinery's
extra dispatch/exchange machinery behaves on actual TPU hardware. A
(1,1) mesh runs the full TP program — owner-shard gather/scatter
schedule, shard padding, psum sites (degenerate at S=1) — on the one
real chip, so `t_tp / t_single` isolates the machinery's cost with zero
collective traffic. Shapes are the ML-1M headline
(`BENCHMARKS.md`: 6,040 x 3,706, F=20, M=20, B=8192).

Run (TPU): python tools/probe_tp_tpu.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rankfm_tpu.ops.fused import pack_history_device
from rankfm_tpu.ops.training import make_epoch_fn
from rankfm_tpu.parallel.mesh import make_mesh
from rankfm_tpu.parallel import tp as tp_mod

U, I, F, M, n, bs = 6040, 3706, 20, 20, 749_724, 8192

rng = np.random.default_rng(1492)
w = {
    "w_i": jnp.zeros(I), "w_if": jnp.zeros(1),
    "v_u": jnp.asarray(rng.normal(0, .1, (U, F)).astype(np.float32)),
    "v_i": jnp.asarray(rng.normal(0, .1, (I, F)).astype(np.float32)),
    "v_uf": jnp.zeros((1, F)), "v_if": jnp.zeros((1, F)),
}
x_uf, x_if = jnp.zeros((U, 1)), jnp.zeros((I, 1))
item_p = 1.0 / np.arange(1, I + 1) ** 0.9
item_p /= item_p.sum()
u = rng.integers(0, U, n).astype(np.int32)
i = rng.choice(I, size=n, p=item_p).astype(np.int32)
uniq = np.unique(np.stack([u, i], 1), axis=0)
counts = np.bincount(uniq[:, 0], minlength=U)
offsets = np.zeros(U + 1, np.int32)
offsets[1:] = np.cumsum(counts)
hist = pack_history_device(offsets, uniq[:, 1].astype(np.int32), U, I)
mrl = int(counts.max())


def main():
    assert jax.devices()[0].platform == "tpu", "probe needs the TPU"
    mesh = make_mesh(data=1, model=1)
    # the epoch fns reshape to whole batches — pad like run_xla does
    # (pad rows carry valid=0 via the n_real static)
    n_pad = -(-n // bs) * bs
    u_p = np.zeros(n_pad, np.int32)
    i_p = np.zeros(n_pad, np.int32)
    sw_p = np.zeros(n_pad, np.float32)
    u_p[:n], i_p[:n], sw_p[:n] = u, i, 1.0
    args = (jnp.asarray(u_p), jnp.asarray(i_p), jnp.asarray(sw_p), n,
            jnp.float32(0.1), jnp.float32(0.01), jnp.float32(0.1),
            jax.random.PRNGKey(3), 0)

    def best_of(run, k=5):
        best = float("inf")
        for _ in range(k):
            t0 = time.time()
            ll = run()
            jax.block_until_ready(ll)
            best = min(best, time.time() - t0)
        return best

    results = {}

    # ---- window step: single-device XLA vs explicit TP ----
    single_w = make_epoch_fn(I, M, False, False, bs, donate=False,
                             step_kind="window")
    tp_w = tp_mod.tp_epoch_fn(mesh, I, M, False, False, bs,
                              step_kind="window")
    hist_w = {"packed": tp_mod.pad_packed_hist(mesh, hist, U)}
    w_tp, xu_t, xi_t = tp_mod.pad_and_place(mesh, dict(w), np.asarray(x_uf),
                                            np.asarray(x_if))

    def run_single_w():
        wc = {k_: v.copy() for k_, v in w.items()}
        _, ll = single_w(wc, x_uf, x_if, hist, *args)
        return ll

    def run_tp_w():
        wc = {k_: v.copy() for k_, v in w_tp.items()}
        _, ll = tp_w(wc, xu_t, xi_t, hist_w, *args)
        return ll

    t1w = best_of(run_single_w)
    ttw = best_of(run_tp_w)
    results["window"] = (t1w, ttw)
    print(f"window    | single {t1w*1e3:7.1f} ms | explicit TP (1,1) "
          f"{ttw*1e3:7.1f} ms | overhead {(ttw/t1w-1)*100:+.0f}%")

    # ---- candidate step: single-device XLA vs explicit TP ----
    single_c = make_epoch_fn(I, M, False, False, bs, donate=False,
                             step_kind="candidate", sampler="bsearch",
                             max_row_len=mrl)
    tp_c = tp_mod.tp_epoch_fn(mesh, I, M, False, False, bs,
                              max_row_len=mrl)
    hist_csr = {"offsets": jnp.asarray(offsets),
                "flat": jnp.asarray(uniq[:, 1].astype(np.int32)),
                "bitmap": jnp.zeros((1, 1), jnp.uint32)}

    def run_single_c():
        wc = {k_: v.copy() for k_, v in w.items()}
        _, ll = single_c(wc, x_uf, x_if, hist_csr, *args)
        return ll

    def run_tp_c():
        wc = {k_: v.copy() for k_, v in w_tp.items()}
        _, ll = tp_c(wc, xu_t, xi_t, hist_csr, *args)
        return ll

    t1c = best_of(run_single_c)
    ttc = best_of(run_tp_c)
    results["candidate"] = (t1c, ttc)
    print(f"candidate | single {t1c*1e3:7.1f} ms | explicit TP (1,1) "
          f"{ttc*1e3:7.1f} ms | overhead {(ttc/t1c-1)*100:+.0f}%")
    return results


if __name__ == "__main__":
    main()
