"""Probe: measure oracle-vs-build metric deltas on the ML-1M-like parity
config (2.4k users x 1.2k items x ~120k rows) before pinning test gates.

Runs the C++ sequential reference-semantics oracle (native/oracle.cpp) and
the TPU build on identical data + init, prints all five metrics for each of
the three variants (WARP+weights, WARP+features, BPR). Used to choose the
test_parity.py gates; re-run after any training-semantics change.
"""

import os
import sys
import time

import numpy as np

if os.environ.get("PROBE_CPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from rankfm_tpu import RankFM, evaluation, native  # noqa: E402
from parity_common import (  # noqa: E402
    make_latent_dataset, make_features, oracle_metrics)


def run_variant(name, loss, max_samples, use_features, use_weights, seed=11):
    rng = np.random.default_rng(seed)
    train, test = make_latent_dataset(rng)
    uf, itf = make_features(rng, train) if use_features else (None, None)
    sw = (rng.integers(1, 4, len(train)).astype(np.float32)
          if use_weights else None)

    model = RankFM(factors=16, loss=loss, max_samples=max_samples,
                   alpha=0.01, beta=0.1, sigma=0.1, learning_rate=0.1,
                   learning_schedule='invscaling', seed=1492)
    t0 = time.time()
    model.fit(train, user_features=uf, item_features=itf,
              sample_weight=sw, epochs=10)
    fit_s = time.time() - t0
    m_build = evaluation.compute(model, test, k=10)

    t0 = time.time()
    m_oracle = oracle_metrics(model, train, test, epochs=10,
                              user_features=uf, item_features=itf,
                              sample_weight=sw)
    orc_s = time.time() - t0

    print(f"\n== {name} (fit {fit_s:.1f}s, oracle {orc_s:.1f}s) ==")
    for k in m_build:
        print(f"  {k:28s} build={m_build[k]:.4f} oracle={m_oracle[k]:.4f} "
              f"delta={m_build[k] - m_oracle[k]:+.4f}")
    return m_build, m_oracle


if __name__ == "__main__":
    assert native.get_oracle() is not None, "C++ oracle unavailable"
    run_variant("WARP + sample_weight", "warp", 10, False, True)
    run_variant("WARP + features", "warp", 10, True, False)
    run_variant("BPR", "bpr", 1, False, False)
    print("\nok")
