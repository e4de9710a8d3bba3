"""Quality at NBLK>1: block-structured data with 3072 items (3 window blocks)."""
import sys
import numpy as np
import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from rankfm_tpu import RankFM, evaluation

rng = np.random.default_rng(42)
NG, UPG, IPG, PER = 4, 150, 2048, 40   # 8192 items -> NBLK=8
rows = []
for u in range(NG * UPG):
    g = u % NG
    own = rng.choice(np.arange(g * IPG, (g + 1) * IPG), PER, replace=False)
    rows += [(u, it) for it in own]
arr = np.array(rows, dtype=np.int64)
mask = rng.random(len(arr)) < 0.75
train, test = arr[mask], arr[~mask]
users = np.arange(80)

for fused in (True, False):
    np.random.seed(7)
    m = RankFM(factors=16, loss="warp", max_samples=10, learning_rate=0.1,
               learning_schedule="invscaling", use_fused=fused)
    m.fit(train, epochs=30)
    recs = m.recommend(users, n_items=10, filter_previous=True)
    fr = []
    for idx, u in enumerate(users):
        g = idx % NG
        items = recs.loc[u].values
        fr.append(((items >= g * IPG) & (items < (g + 1) * IPG)).mean())
    hr_t = evaluation.hit_rate(m, train[:5000], k=10)
    print(f"fused={fused}: coherence={np.mean(fr):.3f} HRtrain={hr_t:.3f} "
          f"ll {m.training_log_[0]['log_likelihood']:.0f} -> {m.training_log_[-1]['log_likelihood']:.0f}")
