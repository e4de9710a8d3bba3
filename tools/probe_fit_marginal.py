"""Marginal per-epoch cost of the REAL fit path: time warm
fit_partial(epochs=E) at E=10/20/40 — the slope is the true per-epoch
device cost inside `fit`, the intercept is the per-fit fixed cost
(ingest hash, layout reuse, finish() sync). Run on TPU."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rankfm_tpu import RankFM  # noqa: E402

N_USERS, N_ITEMS, N_INTER = 6040, 3706, 749_724
rng = np.random.default_rng(1492)
item_p = 1.0 / np.arange(1, N_ITEMS + 1) ** 0.9
item_p /= item_p.sum()
act = np.minimum(np.maximum(
    rng.lognormal(mean=4.0, sigma=0.9, size=N_USERS), 20), 1500)
target = np.round(np.cumsum(act * (N_INTER / act.sum()))).astype(np.int64)
act = np.maximum(np.diff(np.concatenate([[0], target])), 5)
users = np.repeat(np.arange(N_USERS), act)[:N_INTER]
items = rng.choice(N_ITEMS, size=len(users), p=item_p)
inter = np.stack([users, items], 1).astype(np.int64)

model = RankFM(factors=20, loss="warp", max_samples=20, alpha=0.01,
               sigma=0.1, learning_rate=0.1, learning_schedule="invscaling")
model.fit(inter, epochs=1)
model.fit_partial(inter, epochs=40)  # warm everything incl. any reshapes

res = {}
for e in (10, 20, 40):
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        model.fit_partial(inter, epochs=e)
        best = min(best, time.time() - t0)
    res[e] = best
    print(f"epochs={e:3d}  best={best:.3f}s  ({best / e * 1000:.2f} ms/epoch)")

slope = (res[40] - res[10]) / 30
fixed = res[20] - slope * 20
print(f"marginal per-epoch: {slope * 1000:.2f} ms; per-fit fixed: "
      f"{fixed * 1000:.0f} ms")
print(f"implied bench at 20 epochs: {N_INTER * 20 / res[20] / 1e6:.1f} M rows/s "
      f"= {N_INTER * 20 / res[20] / 504900:.1f}x")
