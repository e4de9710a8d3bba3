"""Seed-robustness of the fused WINDOW path at full ML-1M scale (4 window
blocks, 20 epochs, headline config): per-seed deltas vs the sequential
C++ oracle, to justify the tightened +-0.03 gate in
tests/test_parity.py::test_full_ml1m_scale_parity_headline_config.

(The small-catalog probe `probe_dispatch_smallcat.py` showed the window
path's quality gap is seed-variance with a fat left tail at <= 2 blocks;
this checks whether that tail exists at the 4-block headline scale too.)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from rankfm_tpu import RankFM, evaluation  # noqa: E402
from parity_common import make_latent_dataset, oracle_metrics  # noqa: E402

METRICS = ("hit_rate", "reciprocal_rank", "discounted_cumulative_gain",
           "precision", "recall")

rng = np.random.default_rng(1492)
train, test = make_latent_dataset(rng, n_users=6040, n_items=3706,
                                  per_user=165, sharp=1.2)
print(f"train={len(train)} test={len(test)}", flush=True)

for seed in (1492, 7, 23):
    m = RankFM(factors=20, loss="warp", max_samples=20, alpha=0.01,
               sigma=0.1, learning_rate=0.1, learning_schedule="invscaling",
               seed=seed)
    t0 = time.time()
    m.fit(train, epochs=20)
    fit_s = time.time() - t0
    mets = evaluation.compute(m, test, k=10)
    oracle = oracle_metrics(m, train, test, epochs=20)
    print(f"seed={seed}: fit={fit_s:.1f}s "
          + " ".join(f"{k}={mets[k]:.3f}({mets[k]-oracle[k]:+.3f})"
                     for k in METRICS), flush=True)
