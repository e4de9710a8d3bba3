"""Roofline / MFU accounting for the fused WARP kernel at the ML-1M
headline (round-4 VERDICT #7: record MEASURED utilization numbers so
future optimization rounds know whether the headline is MXU-, bandwidth-,
or overhead-bound).

The kernel's per-chunk FLOPs are an exact analytic inventory (every MXU
contraction's shape is static — listed below from `ops/fused.py::_kernel`);
the probe measures the steady epoch wall time on the real chip and reports
achieved FLOP/s against the v5e peak (197 TFLOP/s bf16, 819 GB/s HBM —
PALLAS_AXON_TPU_GEN=v5e), plus the HBM traffic model (records + window
membership columns; tables are VMEM-resident so steady-state table traffic
is zero). A second timing at SUB=4 isolates per-grid-step overhead.

Run (TPU): python tools/probe_roofline.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

from rankfm_tpu import RankFM  # noqa: E402
from rankfm_tpu.models import planner as planner_mod  # noqa: E402
from rankfm_tpu.ops import fused  # noqa: E402

# this probe measures the PURE main kernel's utilization — disable the
# chunk-tail schedule (round 5 default) so every epoch runs one layout
_orig_plan_fit = planner_mod.plan_fit


def _no_tail_plan(spec):
    import dataclasses
    return dataclasses.replace(_orig_plan_fit(spec), chunk_tail=0)


planner_mod.plan_fit = _no_tail_plan

sys.path.insert(0, os.path.dirname(__file__) or ".")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench  # noqa: E402

PEAK_BF16 = 197e12   # v5e MXU peak, FLOP/s
PEAK_HBM = 819e9     # v5e HBM, B/s


def chunk_flops(C, UB, BLK, NW, F=20, has_uf=False, has_if=False):
    """Exact MXU FLOPs (2*M*N*K) per chunk for the featureless kernel, by
    contraction (ops/fused.py::_kernel line refs in comments)."""
    LANES, LW = 128, BLK // 16
    W2 = NW * BLK
    mm = {
        "u_rows [C,UB]x[UB,128]": 2 * C * UB * LANES,          # gather
        "membership [C,UB]x[UB,2*NW*LW]": 2 * C * UB * 2 * NW * LW,
        "i_rows [C,BLK]x[BLK,128]": 2 * C * BLK * LANES,       # gather
        "all_w [C,128]x[128,W2]": 2 * C * LANES * W2,          # window scores
        "j_rows [C,W2]x[W2,128]": 2 * C * W2 * LANES,          # gather
        "scat_u [UB,C]x[C,128]": 2 * UB * C * LANES,           # scatter
        "scat_i [BLK,C]x[C,128]": 2 * BLK * C * LANES,         # scatter
        "scat_j [W2,C]x[C,128]": 2 * W2 * C * LANES,           # scatter
    }
    # "useful" FM math the reference's scalar loop would do per row:
    # forward 2 dots of F + per-drawn-negative F-dim score + 3F-dim update
    # (sampled ~ M worst case); everything else above is the one-hot
    # gather/scatter machinery that buys MXU execution
    useful = 2 * C * (2 * F + 20 * F + 3 * F)
    return mm, useful


def chunk_hbm_bytes(C, UB, BLK, NW):
    """Per-chunk HBM reads (records + window-membership columns) —
    identical for every SUB (sub-rounds re-schedule the same DMAs)."""
    LW = BLK // 16
    rec = 2 * C * 4                      # [C,2] int32 record block
    win = NW * UB * LW * 4               # membership columns per chunk
    return rec + win


def main():
    assert jax.devices()[0].platform == "tpu", "probe needs the TPU"
    rng = np.random.default_rng(1492)
    inter = bench.make_synthetic(rng)
    n = len(inter)

    times = {}
    for sub in (1, 4):
        os.environ["RANKFM_TPU_SUB"] = str(sub)
        m = RankFM(factors=20, loss="warp", max_samples=20, alpha=0.01,
                   sigma=0.1, learning_rate=0.1,
                   learning_schedule="invscaling")
        m.fit(inter, epochs=1)
        plan = m.last_fit_plan_
        best = 1e9
        for _ in range(5):
            t0 = time.time()
            m.fit_partial(inter, epochs=20)
            best = min(best, time.time() - t0)
        times[sub] = best / 20.0
        print(f"SUB={sub}: {best/20*1e3:.1f} ms/epoch "
              f"(chunk={plan.chunk} ub={plan.user_block} bs={plan.batch_size})",
              flush=True)
    os.environ.pop("RANKFM_TPU_SUB", None)

    C, UB = plan.chunk, plan.user_block
    BLK = fused.block_size(3706)
    NW = fused.default_n_windows(fused.item_pad(3706) // BLK)
    nb = -(-n // plan.batch_size)
    chunks_per_epoch = nb * (plan.batch_size // C)

    mm, useful = chunk_flops(C, UB, BLK, NW)
    per_chunk = sum(mm.values())
    total = per_chunk * chunks_per_epoch
    hbm = chunk_hbm_bytes(C, UB, BLK, NW) * chunks_per_epoch
    t = times[1]
    print(f"\nchunk inventory (C={C} UB={UB} BLK={BLK} NW={NW}):")
    for k, v in mm.items():
        print(f"  {k:42s} {v/1e6:7.1f} MFLOP")
    print(f"  total/chunk {per_chunk/1e6:.1f} MFLOP "
          f"(useful FM math ~{useful/1e6:.2f} MFLOP -> "
          f"{useful/per_chunk*100:.1f}% of issued FLOPs)")
    print(f"\nepoch: {chunks_per_epoch} chunks, {total/1e12:.2f} TFLOP, "
          f"{hbm/1e6:.0f} MB HBM traffic (records+membership)")
    print(f"measured epoch {t*1e3:.1f} ms -> "
          f"{total/t/1e12:.1f} TFLOP/s = {total/t/PEAK_BF16*100:.0f}% of "
          f"v5e bf16 peak; HBM {hbm/t/1e9:.1f} GB/s = "
          f"{hbm/t/PEAK_HBM*100:.1f}% of peak")
    ov = (times[1] - times[4]) / times[1]
    print(f"grid-step overhead (SUB=1 vs SUB=4 epoch): {ov*100:+.1f}% "
          f"({times[1]*1e3:.1f} vs {times[4]*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
