"""Feature-path benchmark: Instacart-shaped fit WITH department side
features (the reference's notebook workload, instacart.ipynb cells 64-70:
factors=50, loss='warp', max_samples=50, 30 epochs, log2 sample weights,
fit 84 s on the author's laptop).

Side features fuse into the Pallas kernel (round 2) — this measures the
auto path (mixed: fused epochs + candidate tail at 33 window blocks) with
x_if one-hot departments, and reports throughput vs the 84 s reference fit.

Run on TPU: python tools/probe_feature_bench.py
"""
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rankfm_tpu import RankFM, evaluation

N_USERS, N_ITEMS, N_DEPTS = 10_000, 33_362, 21
REF_FIT_S = 84.0
EPOCHS = 30

rng = np.random.default_rng(1492)
item_dept = rng.integers(0, N_DEPTS, N_ITEMS)
item_pop = 1.0 / np.arange(1, N_ITEMS + 1) ** 0.8
rows_u, rows_i, rows_c = [], [], []
for u in range(N_USERS):
    taste = rng.dirichlet(np.ones(N_DEPTS) * 0.2)
    p = item_pop * taste[item_dept]
    p /= p.sum()
    n_products = int(np.clip(rng.lognormal(3.6, 0.8), 5, 400))
    rows_u.append(np.full(n_products, u))
    rows_i.append(rng.choice(N_ITEMS, size=n_products, replace=False, p=p))
    rows_c.append(rng.geometric(0.35, size=n_products))
df = pd.DataFrame({"user_id": np.concatenate(rows_u),
                   "product_id": np.concatenate(rows_i),
                   "n_orders": np.concatenate(rows_c)})
train = df.sample(frac=0.68, random_state=1492)
valid = df.drop(train.index)
sw = np.log2(train["n_orders"].values + 1).astype(np.float32)

# department one-hot item features for exactly the training items
items = np.unique(train["product_id"].values)
feat = np.zeros((len(items), N_DEPTS), dtype=np.float32)
feat[np.arange(len(items)), item_dept[items]] = 1.0
item_features = pd.DataFrame(
    np.column_stack([items, feat]),
    columns=["product_id"] + [f"dept_{d}" for d in range(N_DEPTS)])

m = RankFM(factors=50, loss="warp", max_samples=50, alpha=0.01,
           learning_rate=0.1, learning_schedule="invscaling", seed=1492)
t0 = time.time()
m.fit(train[["user_id", "product_id"]], item_features=item_features,
      sample_weight=sw, epochs=1)
warm = time.time() - t0
t0 = time.time()
m.fit_partial(train[["user_id", "product_id"]], item_features=item_features,
              sample_weight=sw, epochs=EPOCHS)
fit_s = time.time() - t0
n = len(train)
print(f"fit(features): {fit_s:.1f}s for {EPOCHS} epochs x {n} rows "
      f"({n*EPOCHS/fit_s/1e6:.2f} M rows/s)  warmup={warm:.0f}s")
print(f"vs reference 84 s fit: {REF_FIT_S/fit_s:.1f}x")
t0 = time.time()
metrics = evaluation.compute(m, valid[["user_id", "product_id"]], k=10)
print(f"5-metric eval (shared retrieval): {time.time()-t0:.1f}s")
for k, v in metrics.items():
    print(f"  {k:28s} {v:.3f}")
