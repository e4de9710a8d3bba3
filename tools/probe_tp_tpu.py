"""Bound the explicit-TP machinery's overhead ON THE REAL CHIP (VERDICT r3
next #4): run the table-parallel window and candidate epochs on a (1,1)
TPU mesh against the plain single-chip XLA step at full ML-1M shape.

On one device every collective is a self-copy, so the measured delta is
pure TP dispatch/exchange overhead — the on-hardware complement to the
8-virtual-CPU-mesh partition-overhead rows in BENCHMARKS.md (+30% window /
+83% candidate there, but that mesh shares host cores AND its collectives
are memcpys; neither bound transfers to a TPU).

Forces the TP path by patching `parallel.train.uses_dp` to False (ML-1M
tables are ~780 KB — far under the 256 MB DP threshold, so the planner
would otherwise place DP/replicated).

Run on TPU:  python tools/probe_tp_tpu.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

from rankfm_tpu import RankFM  # noqa: E402
from rankfm_tpu.parallel import train as train_mod  # noqa: E402

U, I, N, EPOCHS = 6040, 3706, 749_724, 5


def make_data():
    rng = np.random.default_rng(1492)
    item_p = 1.0 / np.arange(1, I + 1) ** 0.9
    item_p /= item_p.sum()
    act = np.minimum(np.maximum(
        rng.lognormal(mean=4.0, sigma=0.9, size=U), 20), 1500)
    target = np.round(np.cumsum(act * (N / act.sum()))).astype(np.int64)
    act = np.maximum(np.diff(np.concatenate([[0], target])), 5)
    users = np.repeat(np.arange(U), act)[:N]
    items = rng.choice(I, size=len(users), p=item_p)
    return np.stack([users, items], 1).astype(np.int64)


def timed_fit(model, inter):
    t0 = time.time()
    model.fit(inter, epochs=1)          # compile + first epoch
    warm = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        model.fit_partial(inter, epochs=EPOCHS)
        best = min(best, (time.time() - t0) / EPOCHS)
    return warm, best


def main():
    inter = make_data()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} / {getattr(dev, 'device_kind', '?')}")
    mesh11 = jax.sharding.Mesh(
        np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))

    results = {}
    for step in ("window", "candidate"):
        m = RankFM(factors=20, loss="warp", max_samples=20, alpha=0.01,
                   sigma=0.1, learning_rate=0.1,
                   learning_schedule="invscaling",
                   use_fused=False, train_step=step)
        warm, single = timed_fit(m, inter)
        print(f"single-chip {step}: warm={warm:.1f}s epoch={single*1000:.0f} ms",
              flush=True)

        orig = train_mod.uses_dp
        train_mod.uses_dp = lambda *a, **k: False   # force explicit TP
        try:
            mt = RankFM(factors=20, loss="warp", max_samples=20, alpha=0.01,
                        sigma=0.1, learning_rate=0.1,
                        learning_schedule="invscaling",
                        use_fused=False, train_step=step, mesh=mesh11)
            warm_tp, tp = timed_fit(mt, inter)
        finally:
            train_mod.uses_dp = orig
        assert mt.last_fit_plan_.placement == "tp", mt.last_fit_plan_
        print(f"TP(1,1)     {step}: warm={warm_tp:.1f}s epoch={tp*1000:.0f} ms "
              f"-> overhead {100 * (tp / single - 1):+.0f}%", flush=True)
        results[step] = (single, tp)

    for step, (s, t) in results.items():
        print(f"SUMMARY {step}: single={s*1000:.0f}ms tp={t*1000:.0f}ms "
              f"overhead={100 * (t / s - 1):+.0f}%")


if __name__ == "__main__":
    main()
