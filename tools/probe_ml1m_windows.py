"""A/B: fused negative-window count at FULL ML-1M scale (<= 8 window
blocks, where the default is a single 1024-item window per chunk).

The round-1 parity table shows the fused path giving up ~0.05 hit-rate vs
the sequential oracle at equal epochs — the suspected cause is the
window-limited hardest-negative pool (WARP wants the hardest negative of
up to `max_samples` catalog-wide draws; one window caps the pool at 1024
items). Arms widen the per-chunk pool (`n_windows` ctor knob) and measure
quality + steady throughput on the headline config:

  nw1 — default (1 window/chunk)
  nw2 — 2 windows/chunk
  nw4 — 4 windows/chunk = the whole 3,706-item catalog visible

Decision rule: if nw4 closes HR/MRR/DCG to within the candidate band
(+-0.02 of the oracle) while staying >= 50x the reference's 505k rows/s,
widen `default_n_windows` for small-block catalogs.
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

oracle = None
for arm, nw, ts in (("nw1", None, "auto"), ("nw2", 2, "auto"),
                    ("nw4", 4, "auto"),
                    # mixed at <= 8 blocks: fused epochs + 3 candidate tail
                    # epochs — does catalog-wide hardest-negative finishing
                    # close the fused HR gap while staying >= 50x?
                    ("mixed", None, "mixed")):
    m = RankFM(factors=20, loss="warp", max_samples=20, alpha=0.01,
               sigma=0.1, learning_rate=0.1, learning_schedule="invscaling",
               seed=1492, n_windows=nw, train_step=ts)
    t0 = time.time()
    m.fit(train, epochs=20)
    cold = time.time() - t0
    t0 = time.time()
    m.fit(train, epochs=20)
    steady = time.time() - t0
    mets = evaluation.compute(m, test, k=10)
    if oracle is None:
        t0 = time.time()
        oracle = oracle_metrics(m, train, test, epochs=20)
        print("oracle (%.0fs): " % (time.time() - t0)
              + " ".join(f"{k}={oracle[k]:.3f}" for k in METRICS), flush=True)
    rows_s = len(train) * 20 / steady
    print(f"{arm}: cold={cold:.1f}s steady={steady:.2f}s "
          f"({rows_s/1e6:.1f}M rows/s, {rows_s/504_900:.0f}x) "
          + " ".join(f"{k}={mets[k]:.3f}({mets[k]-oracle[k]:+.3f})"
                     for k in METRICS), flush=True)
