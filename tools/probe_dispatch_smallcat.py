"""A/B: training-step dispatch on SMALL catalogs (<= 2 window blocks).

The round-2 parity table measured the fused window path at -0.049 HR /
-0.056 DCG vs the sequential oracle on the 2.4k x 1.2k x ~90k parity config
(10 epochs) while the candidate step sat at +-0.003. At full ML-1M scale
(4 blocks, 20 epochs) the window path is within -0.014 on every metric
(tools/probe_ml1m_windows.py), so the gap concentrates at tiny catalogs —
where a 1024-item window is ~most of the catalog anyway and the candidate
step's full [B, I] score matmul costs the same as the window matmul.

Arms x seeds, each scored against ITS OWN oracle run (same seed/init):
  window    — today's auto dispatch at <= 8 blocks (fused Pallas kernel)
  candidate — reference-exact sampling (proposed auto for <= 2 blocks)
  mixed     — fused + 3-epoch candidate tail (the >8-block default)

Decision rule: if candidate stays within +-0.02-0.03 of the oracle on all
five metrics across seeds AND its steady epoch cost at this shape is
competitive, dispatch <= 2-block catalogs to the candidate step and tighten
tests/test_parity.py FUSED gates.
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

rng = np.random.default_rng(11)
train, test = make_latent_dataset(rng)
sw = rng.integers(1, 4, len(train)).astype(np.float32)
print(f"train={len(train)} test={len(test)}", flush=True)

ARMS = (("window", dict()),
        ("candidate", dict(use_fused=False, train_step="candidate")),
        ("mixed", dict(train_step="mixed")))

for seed in (1492, 7, 23):
    oracle = None
    for arm, kw in ARMS:
        m = RankFM(factors=16, loss="warp", max_samples=10, alpha=0.01,
                   beta=0.1, sigma=0.1, learning_rate=0.1,
                   learning_schedule="invscaling", seed=seed, **kw)
        t0 = time.time()
        m.fit(train, sample_weight=sw, epochs=10)
        cold = time.time() - t0
        t0 = time.time()
        m.fit(train, sample_weight=sw, epochs=10)
        steady = time.time() - t0
        mets = evaluation.compute(m, test, k=10)
        if oracle is None:
            oracle = oracle_metrics(m, train, test, epochs=10,
                                    sample_weight=sw)
        print(f"seed={seed} {arm}: cold={cold:.1f}s steady={steady:.2f}s "
              + " ".join(f"{k}={mets[k]:.3f}({mets[k]-oracle[k]:+.3f})"
                         for k in METRICS), flush=True)
