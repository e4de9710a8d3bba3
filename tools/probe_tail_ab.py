"""A/B: tail strategy on an Instacart-class catalog (33k items, >8 window
blocks, no side features).

Arms (all 30 epochs, same data/seeds):
  mixed      — default: 27 fused epochs + 3 candidate-step tail epochs
  fused      — 30 fused epochs, NW=4 windows/chunk (no tail)
  wide8/16   — 27 fused epochs + 3 fused tail epochs with NW=8/16 windows
               (tail_windows knob) — candidate-grade catalog exposure at a
               fraction of the candidate step's cost

Decides whether the wide-window tail can replace the candidate tail as the
big-catalog default (BENCHMARKS.md Instacart row: mixed 3.9 s = 22x; the
candidate tail is ~1.3 s of that).
"""
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from rankfm_tpu import RankFM, evaluation  # noqa: E402

rng = np.random.default_rng(1492)
N_USERS, N_ITEMS, N_DEPTS = 10_000, 33_362, 21
item_dept = rng.integers(0, N_DEPTS, N_ITEMS)
item_pop = 1.0 / np.arange(1, N_ITEMS + 1) ** 0.8
rows_u, rows_i = [], []
for u in range(N_USERS):
    taste = rng.dirichlet(np.ones(N_DEPTS) * 0.2)
    p = item_pop * taste[item_dept]
    p /= p.sum()
    n_products = int(np.clip(rng.lognormal(3.6, 0.8), 5, 400))
    rows_u.append(np.full(n_products, u))
    rows_i.append(rng.choice(N_ITEMS, size=n_products, replace=False, p=p))
df = pd.DataFrame({"user_id": np.concatenate(rows_u),
                   "product_id": np.concatenate(rows_i)})
train = df.sample(frac=0.68, random_state=1492)
valid = df.drop(train.index)

ARMS = (
    ("mixed", dict(train_step="mixed")),
    ("fused", dict(train_step="window")),
    ("wide8", dict(train_step="mixed", tail_windows=8)),
    ("wide16", dict(train_step="mixed", tail_windows=16)),
)

for arm, kw in ARMS:
    for trial in (0, 1):
        np.random.seed(100 + trial)
        m = RankFM(factors=50, loss="warp", max_samples=50, alpha=0.01,
                   learning_rate=0.1, learning_schedule="invscaling",
                   seed=1492 + trial, **kw)
        t0 = time.time()
        m.fit(train, epochs=30)
        fit_s = time.time() - t0
        # steady-state fit (warm programs): what BENCHMARKS reports
        t0 = time.time()
        m.fit(train, epochs=30)
        steady_s = time.time() - t0
        hr = evaluation.hit_rate(m, valid, k=10)
        mrr = evaluation.reciprocal_rank(m, valid, k=10)
        print(f"{arm} trial={trial}: fit={fit_s:.1f}s steady={steady_s:.1f}s "
              f"({len(train)*30/steady_s/1e6:.2f}M rows/s) "
              f"HR={hr:.3f} MRR={mrr:.3f}", flush=True)
