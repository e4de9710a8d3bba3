"""Probe: SUB sub-rounds per grid step must be BITWISE equivalent to SUB=1.

One grid step running SUB sequential 256-row chunks reseeds the PRNG at the
virtual chunk index, so the training trajectory (tables AND log-likelihood)
must match the one-chunk-per-grid-step program exactly. Also times a
multi-epoch scan per SUB to measure the fixed-grid-step-cost amortization.

Run on TPU: python tools/probe_sub_rounds.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from rankfm_tpu.ops import fused


def main():
    assert jax.devices()[0].platform == "tpu", "probe needs the TPU"
    rng = np.random.default_rng(7)
    # ML-1M-ish shape: enough chunks per batch for SUB=4 to matter
    U, I, F, M = 6040, 3706, 8, 40
    n = 200_000
    B = 32768
    chunk = 256
    u = rng.integers(0, U, n).astype(np.int32)
    i = rng.integers(0, I, n).astype(np.int32)
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    u, i = pairs[:, 0], pairs[:, 1]
    n = len(u)
    order = np.argsort(u, kind="stable")
    counts = np.bincount(u, minlength=U)
    offsets = np.zeros(U + 1, np.int32)
    offsets[1:] = np.cumsum(counts)
    packed = fused.pack_history_device(offsets, i[order].astype(np.int32), U, I)
    win_cols = fused.pack_win_cols(packed, U, I)
    ub = fused.pick_user_block(U, I, n, chunk)
    layout = tuple(map(jnp.asarray, fused.make_records_grouped(
        u, i, np.ones(n, np.float32), U, I, B, chunk, ub=ub)))
    tu0, ti0 = fused.extend_tables(
        jnp.zeros(I),
        jnp.asarray(rng.normal(0, .1, (U, F)).astype(np.float32)),
        jnp.asarray(rng.normal(0, .1, (I, F)).astype(np.float32)),
        fused.user_pad(U, ub), fused.item_pad(I))

    results = {}
    for sub in (8, 4, 2, 1):
        ep = fused.make_fused_epoch_fn(U, I, F, M, B, chunk=chunk,
                                       donate=False, ub=ub, sub=sub)
        t0 = time.perf_counter()
        tu, ti, ll = ep(tu0, ti0, win_cols, *layout, 0.1, 0.01,
                        jax.random.PRNGKey(0), 0)
        jax.block_until_ready((tu, ti, ll))
        compile_s = time.perf_counter() - t0
        # timed epochs (block per epoch: remote-tunnel dispatch can make
        # fully-async loops report dispatch time, not device time)
        E = 20
        jax.block_until_ready((tu, ti))
        t0 = time.perf_counter()
        for e in range(E):
            tu, ti, ll = ep(tu, ti, win_cols, *layout, 0.1, 0.01,
                            jax.random.PRNGKey(0), e)
            jax.block_until_ready((tu, ti, ll))
        dt = (time.perf_counter() - t0) / E
        results[sub] = (np.asarray(tu), np.asarray(ti), float(ll),
                        dt, compile_s)
        print(f"sub={sub}: epoch={dt*1e3:.2f} ms  ll={float(ll):.2f}  "
              f"compile={compile_s:.1f}s  "
              f"rate={n/dt/1e6:.1f}M int/s")

    tu1, ti1, ll1 = results[1][:3]
    ok = True
    for sub in (2, 4, 8):
        tus, tis, lls = results[sub][:3]
        same = (np.array_equal(tu1, tus) and np.array_equal(ti1, tis)
                and ll1 == lls)
        print(f"sub={sub} bitwise == sub=1: {same}")
        ok &= same
    print("PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
