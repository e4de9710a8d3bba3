"""Featured chunk-tail gate: the round-5 chunk-tail schedule applied to
a FEATURED pure-fused config (ML-1M shape + 20 one-hot item "genre"
columns — the featured analog of the headline; featured fused plans used
to be gated out of the tail because the user feature-block padding is
layout-coupled, now re-derived per layout in `_FitRun.run_fused`).

A/B at equal epochs vs the C++ sequential oracle ON THE SAME features:
the default (tail on) against the tail forced off, 3 seeds each. Done =
the tail arm is at least as close to the oracle as the no-tail arm
(the mechanism is layout scheduling only; features ride the same
chunks).

Run (TPU): python tools/probe_feature_tail.py
"""
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from rankfm_tpu import RankFM, evaluation  # noqa: E402
from rankfm_tpu.models import planner as planner_mod  # noqa: E402
from parity_common import make_latent_dataset, oracle_metrics  # noqa: E402

METRICS = ("hit_rate", "reciprocal_rank", "discounted_cumulative_gain",
           "precision", "recall")
SEEDS = (23, 7, 1492)
N_GENRES = 20

rng = np.random.default_rng(1492)
train, test = make_latent_dataset(rng, n_users=6040, n_items=3706,
                                  per_user=165, sharp=1.2)
item_ids = np.unique(train[:, 1])
genre = rng.integers(0, N_GENRES, len(item_ids))
if_df = pd.DataFrame(
    np.eye(N_GENRES, dtype=np.float32)[genre])
if_df.insert(0, "item_id", item_ids)

_orig_plan_fit = planner_mod.plan_fit


def _no_tail_plan(spec):
    import dataclasses
    return dataclasses.replace(_orig_plan_fit(spec), chunk_tail=0)


oracles = {}
for arm, patch in (("tail-on", _orig_plan_fit), ("tail-off", _no_tail_plan)):
    planner_mod.plan_fit = patch
    mt = RankFM(factors=20, loss="warp", max_samples=20, alpha=0.01,
                sigma=0.1, learning_rate=0.1, learning_schedule="invscaling")
    t0 = time.time()
    mt.fit(train, item_features=if_df, epochs=1)
    cold = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        mt.fit_partial(train, item_features=if_df, epochs=20)
        best = min(best, time.time() - t0)
    print(f"{arm}: cold={cold:.0f}s steady20={best:.2f}s "
          f"({len(train)*20/best/1e6:.1f}M/s) "
          f"plan ct={mt.last_fit_plan_.chunk_tail}", flush=True)
    for seed in SEEDS:
        m = RankFM(factors=20, loss="warp", max_samples=20, alpha=0.01,
                   sigma=0.1, learning_rate=0.1,
                   learning_schedule="invscaling", seed=seed)
        m.fit(train, item_features=if_df, epochs=20)
        mets = evaluation.compute(m, test, k=10)
        if seed not in oracles:
            oracles[seed] = oracle_metrics(m, train, test, epochs=20,
                                           item_features=if_df)
        o = oracles[seed]
        print(f"{arm} seed={seed}: "
              + " ".join(f"{k}={mets[k]:.3f}({mets[k]-o[k]:+.3f})"
                         for k in METRICS), flush=True)
planner_mod.plan_fit = _orig_plan_fit
