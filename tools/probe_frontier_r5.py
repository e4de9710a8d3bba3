"""Round-5 frontier sweep: the named untested midpoints on the
chunk x user-block x sub-round surface (round-4 VERDICT #4).

Round-4 mapped the frontier — default chunk256@UB1024 = -0.009 HR @ 55x,
chunk128@UB256 = oracle parity (-0.002 HR) @ 47x, UB512/256 at chunk 256
reach 59-61x but miss the quality band — and concluded quality tracks
rows-per-(chunk x user-band). This probe runs the midpoints nobody tried:
chunk192/160 at UB1024/512, and the parity point chunk128@UB256 with
SUB=2/4 (sub-rounds are bitwise-neutral scheduling — probe_sub_rounds.py,
tests/test_fused.py — so they can only buy back grid overhead, never move
quality).

Usage (each combo is "chunk,ub,sub[,batch_size]"; run several per process
so the oracle runs once per seed):

    python tools/probe_frontier_r5.py 192,1024,1,36864 192,512,1,36864 \
        160,512,1,32000 128,256,2 128,256,4

Throughput is bench-style (scratch model, warm programs, best-of-3
fit_partial x 20 epochs); quality is a clean 20-epoch fit per seed vs the
C++ sequential oracle on the same data.
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

# measure each combo's layout PURE: the shipped chunk-tail default
# (which this sweep's results produced) would otherwise silently append
# parity-layout tail epochs to every chunk>128 combo's 20-epoch fits —
# the 1-epoch plan assertion below never sees it (chunk_tail needs
# epochs >= 2). Round-5 self-review finding.
_orig_plan_fit = planner_mod.plan_fit


def _no_tail_plan(spec):
    import dataclasses
    return dataclasses.replace(_orig_plan_fit(spec), chunk_tail=0)


planner_mod.plan_fit = _no_tail_plan

METRICS = ("hit_rate", "reciprocal_rank", "discounted_cumulative_gain",
           "precision", "recall")
SEEDS = (23, 7, 1492)

combos = []
for a in sys.argv[1:]:
    parts = [int(x) for x in a.split(",")]
    chunk, ub, sub = parts[:3]
    bs = parts[3] if len(parts) > 3 else None
    layouts = parts[4] if len(parts) > 4 else None  # shuffle_layouts R
    combos.append((chunk, ub, sub, bs, layouts))
if not combos:
    combos = [(192, 1024, 1, 36864, None), (192, 512, 1, 36864, None),
              (160, 512, 1, 32000, None), (128, 256, 2, None, None),
              (128, 256, 4, None, None)]

rng = np.random.default_rng(1492)
train, test = make_latent_dataset(rng, n_users=6040, n_items=3706,
                                  per_user=165, sharp=1.2)
oracles = {}
orig_pick_chunk = fused.pick_chunk
orig_pick_ub = fused.pick_user_block

for chunk, ub, sub, bs, layouts in combos:
    fused.pick_chunk = (lambda c: (lambda *a, **k: c))(chunk)
    fused.pick_user_block = (lambda b: (lambda *a, **k: b))(ub)
    os.environ["RANKFM_TPU_SUB"] = str(sub)
    kw = {"batch_size": bs} if bs else {}
    if layouts:
        kw["shuffle_layouts"] = layouts
    tag = (f"chunk{chunk}@UB{ub}/SUB{sub}" + (f"/bs{bs}" if bs else "")
           + (f"/R{layouts}" if layouts else ""))
    try:
        mt = RankFM(factors=20, loss="warp", max_samples=20, alpha=0.01,
                    sigma=0.1, learning_rate=0.1,
                    learning_schedule="invscaling", **kw)
        t0 = time.time(); mt.fit(train, epochs=1); cold = time.time() - t0
        plan = mt.last_fit_plan_
        assert plan.fused and plan.chunk == chunk \
            and plan.user_block == ub and plan.sub == sub, \
            (plan.fused, plan.chunk, plan.user_block, plan.sub)
        best = 1e9
        for _ in range(3):
            t0 = time.time(); mt.fit_partial(train, epochs=20)
            best = min(best, time.time() - t0)
        print(f"{tag}: cold={cold:.0f}s steady20={best:.2f}s "
              f"({len(train)*20/best/1e6:.1f}M/s "
              f"{len(train)*20/best/504900:.0f}x)", flush=True)
        for seed in SEEDS:
            m = RankFM(factors=20, loss="warp", max_samples=20, alpha=0.01,
                       sigma=0.1, learning_rate=0.1,
                       learning_schedule="invscaling", seed=seed, **kw)
            m.fit(train, epochs=20)
            mets = evaluation.compute(m, test, k=10)
            if seed not in oracles:
                oracles[seed] = oracle_metrics(m, train, test, epochs=20)
            o = oracles[seed]
            print(f"{tag} seed={seed}: "
                  + " ".join(f"{k}={mets[k]:.3f}({mets[k]-o[k]:+.3f})"
                             for k in METRICS), flush=True)
    except Exception as e:  # a combo the kernel refuses is a RESULT
        print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)
    finally:
        fused.pick_chunk = orig_pick_chunk
        fused.pick_user_block = orig_pick_ub
        os.environ.pop("RANKFM_TPU_SUB", None)
