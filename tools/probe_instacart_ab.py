import sys, time
import numpy as np, pandas as pd
import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from rankfm_tpu import RankFM, evaluation

rng = np.random.default_rng(1492)
N_USERS, N_ITEMS, N_DEPTS = 10_000, 33_362, 21
item_dept = rng.integers(0, N_DEPTS, N_ITEMS)
item_pop = 1.0 / np.arange(1, N_ITEMS + 1) ** 0.8
rows_u, rows_i = [], []
for u in range(N_USERS):
    taste = rng.dirichlet(np.ones(N_DEPTS) * 0.2)
    p = item_pop * taste[item_dept]; p /= p.sum()
    n_products = int(np.clip(rng.lognormal(3.6, 0.8), 5, 400))
    rows_u.append(np.full(n_products, u))
    rows_i.append(rng.choice(N_ITEMS, size=n_products, replace=False, p=p))
df = pd.DataFrame({"user_id": np.concatenate(rows_u), "product_id": np.concatenate(rows_i)})
train = df.sample(frac=0.68, random_state=1492)
valid = df.drop(train.index)

for arm, kw in (("fused", dict()),
                ("candidate", dict(use_fused=False, train_step="candidate"))):
    for trial in (0, 1):
        np.random.seed(100 + trial)
        m = RankFM(factors=50, loss="warp", max_samples=50, alpha=0.01,
                   learning_rate=0.1, learning_schedule="invscaling",
                   seed=1492 + trial, **kw)
        t0 = time.time()
        m.fit(train, epochs=30)
        fit_s = time.time() - t0
        hr = evaluation.hit_rate(m, valid, k=10)
        print(f"{arm} trial={trial}: fit={fit_s:.1f}s "
              f"({len(train)*30/fit_s/1e6:.2f}M rows/s) HRvalid={hr:.3f}",
              flush=True)
