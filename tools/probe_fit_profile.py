"""cProfile a WARM fit_partial at the ML-1M bench shape: where do the
~40 ms of per-fit host wall (bench 27.5 ms/epoch vs raw chained epochs
25.4 ms) actually go? Run on TPU."""
import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rankfm_tpu import RankFM  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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
for _ in range(2):
    model.fit_partial(inter, epochs=20)   # warm everything

t0 = time.time()
model.fit_partial(inter, epochs=20)
print(f"plain warm fit_partial(20): {time.time() - t0:.3f}s")

pr = cProfile.Profile()
pr.enable()
model.fit_partial(inter, epochs=20)
pr.disable()
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(32)
print(s.getvalue())
