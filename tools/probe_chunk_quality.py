"""A/B: fused-kernel chunk size (the synchronous update unit) at the
full ML-1M headline — quality vs the C++ sequential oracle per seed, plus
bench-style steady throughput (scratch model, warm programs, best-of-3
fit_partial; quality from a separate CLEAN 20-epoch fit).

Round-3 result (recorded in BENCHMARKS.md): chunk 512 measures worst-seed
-0.039 HR / -0.082 DCG at 60x; 256 restores +-0.021 on every metric at
54x; 128 only loses throughput (42x). `ops/fused.py:pick_chunk` defaults
to 256 accordingly.

NEGATIVE RESULT (tried and reverted): ROW-PARTITIONED windows — keep the
512-row chunk but give each 256-row half its own window — measured
worst-seed -0.035 HR / -0.069 DCG at only 51x, i.e. quality tracks the
CHUNK (the synchronous update unit: 512 correlated updates applied at the
same stale weights), not the window-sharing width. Don't re-try window
diversity as a substitute for a smaller chunk.
"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from rankfm_tpu import RankFM, evaluation
from rankfm_tpu.ops import fused
from parity_common import make_latent_dataset, oracle_metrics

METRICS = ("hit_rate", "reciprocal_rank", "discounted_cumulative_gain",
           "precision", "recall")
rng = np.random.default_rng(1492)
train, test = make_latent_dataset(rng, n_users=6040, n_items=3706,
                                  per_user=165, sharp=1.2)
oracles = {}
for chunk in (256, 512, 128):
    fused.pick_chunk = (lambda c: (lambda *a, **k: c))(chunk)
    # bench-style steady throughput: scratch model, warm programs,
    # best-of-3 fit_partial
    mt = RankFM(factors=20, loss="warp", max_samples=20, alpha=0.01,
                sigma=0.1, learning_rate=0.1, learning_schedule="invscaling")
    t0 = time.time(); mt.fit(train, epochs=1); cold = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time(); mt.fit_partial(train, epochs=20)
        best = min(best, time.time() - t0)
    print(f"chunk{chunk}: cold={cold:.0f}s steady20={best:.2f}s "
          f"({len(train)*20/best/1e6:.1f}M/s {len(train)*20/best/504900:.0f}x)",
          flush=True)
    for seed in (23, 7, 1492):
        m = RankFM(factors=20, loss="warp", max_samples=20, alpha=0.01,
                   sigma=0.1, learning_rate=0.1,
                   learning_schedule="invscaling", seed=seed)
        m.fit(train, epochs=20)   # clean 20-epoch fit for quality
        mets = evaluation.compute(m, test, k=10)
        if seed not in oracles:
            oracles[seed] = oracle_metrics(m, train, test, epochs=20)
        o = oracles[seed]
        print(f"chunk{chunk} seed={seed}: "
              + " ".join(f"{k}={mets[k]:.3f}({mets[k]-o[k]:+.3f})"
                         for k in METRICS), flush=True)
