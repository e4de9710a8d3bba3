"""Quality probe: a CHUNK-TAIL schedule — main epochs at the fast
chunk256@UB1024 layout, final epochs at the oracle-parity
chunk128@UB256 layout (round-5 frontier: -0.004 HR @ ~47-48x vs
-0.009 @ 55x; see probe_frontier_r5.py results in BENCHMARKS.md).

Hypothesis (mirrors the round-3 result that a short candidate tail
repairs window-only training): the chunk-256 co-update correlation is a
LATE-training precision problem, so finishing with chunk-128 epochs may
buy back most of the quality gap at a fraction of the throughput cost
(epoch cost 27 ms vs ~31 ms -> a 25% tail prices at ~53x).

Emulation: the tail runs as per-epoch `fit_partial(epochs=1)` calls with
`learning_schedule='constant'` and the learning rate pinned to the exact
invscaling value of the CONTINUED epoch numbering (eta_e = lr/(e+1)^0.25)
— so the oracle comparison at equal epochs is schedule-exact; only the
PRNG stream positions differ (any fresh stream is valid sampling).

Run (TPU): python tools/probe_chunk_tail.py [tail_epochs ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from rankfm_tpu import RankFM, evaluation  # noqa: E402
from rankfm_tpu.models import planner as planner_mod  # noqa: E402
from rankfm_tpu.ops import fused  # noqa: E402
from parity_common import make_latent_dataset, oracle_metrics  # noqa: E402

# this probe CONSTRUCTS the main/tail split by hand — disable the
# shipped chunk-tail default (it landed from this probe's own round-5
# result) so the "main phase" fit really is pure fast-layout epochs and
# the explicit tail below is the only tail. Without this the probe would
# measure a nested-tail schedule and could never reproduce its own
# recorded numbers (round-5 self-review finding).
_orig_plan_fit = planner_mod.plan_fit


def _no_tail_plan(spec):
    import dataclasses
    return dataclasses.replace(_orig_plan_fit(spec), chunk_tail=0)


planner_mod.plan_fit = _no_tail_plan

METRICS = ("hit_rate", "reciprocal_rank", "discounted_cumulative_gain",
           "precision", "recall")
SEEDS = (23, 7, 1492)
EPOCHS = 20

tails = [int(a) for a in sys.argv[1:]] or [5, 10]

rng = np.random.default_rng(1492)
train, test = make_latent_dataset(rng, n_users=6040, n_items=3706,
                                  per_user=165, sharp=1.2)
orig_chunk, orig_ub = fused.pick_chunk, fused.pick_user_block


def set_layout(chunk, ub, sub):
    fused.pick_chunk = (lambda c: (lambda *a, **k: c))(chunk)
    fused.pick_user_block = (lambda b: (lambda *a, **k: b))(ub)
    os.environ["RANKFM_TPU_SUB"] = str(sub)


oracles = {}
for tail in tails:
    main_ep = EPOCHS - tail
    for seed in SEEDS:
        m = RankFM(factors=20, loss="warp", max_samples=20, alpha=0.01,
                   sigma=0.1, learning_rate=0.1,
                   learning_schedule="invscaling", seed=seed)
        set_layout(256, 1024, 1)
        m.fit(train, epochs=main_ep)
        set_layout(128, 256, 8)
        m.learning_schedule = "constant"
        for e in range(main_ep, EPOCHS):
            m.learning_rate = 0.1 / (e + 1) ** 0.25
            m.fit_partial(train, epochs=1)
        mets = evaluation.compute(m, test, k=10)
        # the oracle clones the model's hyperparams — restore the real
        # schedule before cloning (the tail emulation mutated them)
        m.learning_rate, m.learning_schedule = 0.1, "invscaling"
        if seed not in oracles:
            oracles[seed] = oracle_metrics(m, train, test, epochs=EPOCHS)
        o = oracles[seed]
        print(f"tail{tail} seed={seed}: "
              + " ".join(f"{k}={mets[k]:.3f}({mets[k]-o[k]:+.3f})"
                         for k in METRICS), flush=True)
    fused.pick_chunk, fused.pick_user_block = orig_chunk, orig_ub
    os.environ.pop("RANKFM_TPU_SUB", None)
