"""A/B: candidate-step membership strategy at ML-1M-class history DENSITY.

Below `models.planner.POST_REJECT_DENSITY` the candidate step tests
membership of only the SELECTED negative post-hoc (cheap); above it, every
draw is pre-filtered (8 bitmap rounds — the dominant candidate-step cost at
ML-1M shape). The reference's own in-place redraw makes pre-filtering the
exact semantics, but post-hoc rejection's residual pollution is
~density^3-rare — this probe measures whether it is metric-visible at the
3% density band (ML-1M is 3.3%, the parity config 3.05%).

Arms (same data/seed, 10 epochs, vs the C++ sequential oracle):
  pre  — POST_REJECT_DENSITY pinned to 0 (always pre-filter; today's
         behavior at >= 2% density)
  post — POST_REJECT_DENSITY pinned to 1 (always post-hoc)
plus candidate-epoch wall time at FULL ML-1M shape for both.

Decision rule: if post stays within +-0.02 of the oracle on every metric
across seeds AND is materially faster at ML-1M shape, raise the default
threshold above the ML-1M band.

MEASURED (2026-08-19, recorded so the threshold isn't re-litigated):
post-hoc is 3.5x faster at ML-1M shape (379 vs 1324 ms/epoch) but its
metric deltas at 3.1% density spread to +-0.027 (seed 7 DCG +0.027 vs
pre's +-0.017) — too thin against the +-0.02 reference-exact parity
gates, so the default stays at 0.02: the candidate step is the
quality-first mode and keeps exact pre-draw semantics at ML-1M density.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from rankfm_tpu import RankFM, evaluation  # noqa: E402
from rankfm_tpu.models import planner as model_mod  # noqa: E402
from parity_common import make_latent_dataset, oracle_metrics  # noqa: E402

METRICS = ("hit_rate", "reciprocal_rank", "discounted_cumulative_gain",
           "precision", "recall")

rng = np.random.default_rng(11)
train, test = make_latent_dataset(rng)
sw = rng.integers(1, 4, len(train)).astype(np.float32)
print(f"small config: train={len(train)} "
      f"density={len(np.unique(train, axis=0))/2400/1200:.3%}", flush=True)

for arm, thr in (("pre", 0.0), ("post", 1.0)):
    model_mod.POST_REJECT_DENSITY = thr
    for seed in (1492, 7):
        m = RankFM(factors=16, loss="warp", max_samples=10, alpha=0.01,
                   beta=0.1, sigma=0.1, learning_rate=0.1,
                   learning_schedule="invscaling", seed=seed,
                   use_fused=False, train_step="candidate")
        t0 = time.time()
        m.fit(train, sample_weight=sw, epochs=10)
        cold = time.time() - t0
        mets = evaluation.compute(m, test, k=10)
        o = oracle_metrics(m, train, test, epochs=10, sample_weight=sw)
        print(f"{arm} seed={seed}: cold={cold:.1f}s "
              + " ".join(f"{k}={mets[k]:.3f}({mets[k]-o[k]:+.3f})"
                         for k in METRICS), flush=True)

# wall time at FULL ML-1M shape (candidate epochs only; quality not
# re-measured here — the full-scale candidate fit is ~13 s/arm)
rng = np.random.default_rng(1492)
train_big, _ = make_latent_dataset(rng, n_users=6040, n_items=3706,
                                   per_user=165, sharp=1.2)
for arm, thr in (("pre", 0.0), ("post", 1.0)):
    model_mod.POST_REJECT_DENSITY = thr
    m = RankFM(factors=20, loss="warp", max_samples=20, alpha=0.01,
               sigma=0.1, learning_rate=0.1, learning_schedule="invscaling",
               use_fused=False, train_step="candidate")
    t0 = time.time(); m.fit(train_big, epochs=1); cold = time.time() - t0
    best = 1e9
    for _ in range(2):
        t0 = time.time(); m.fit_partial(train_big, epochs=5)
        best = min(best, time.time() - t0)
    print(f"ml1m-shape {arm}: cold={cold:.0f}s steady5={best:.2f}s "
          f"({best/5*1e3:.0f} ms/epoch)", flush=True)
