"""Probe: fused kernel on a 1-device DP mesh vs the plain single-chip path.

On one chip the DP path should cost ~nothing extra (the delta-psum over a
1-device mesh compiles away); this measures the shard_map/merge overhead so
multi-chip projections start from an honest single-device baseline.

Run on the TPU: python tools/probe_fused_dp.py
"""

import time

import numpy as np
import pandas as pd

import jax


def synth_ml1m(seed=0, n_users=6040, n_items=3706, n_rows=750_000):
    rng = np.random.default_rng(seed)
    pop = rng.zipf(1.3, size=n_rows * 2) % n_items
    users = rng.integers(0, n_users, n_rows * 2)
    df = pd.DataFrame({"user_id": users, "item_id": pop})
    df = df.drop_duplicates().head(n_rows)
    return df


def main():
    from rankfm_tpu import RankFM

    d = jax.devices()
    print("devices:", d)
    df = synth_ml1m()
    print(f"rows={len(df)}")

    results = {}
    for label, mesh in (
        ("single", None),
        ("dp_mesh_1dev",
         jax.sharding.Mesh(np.asarray(d[:1]).reshape(1, 1),
                           axis_names=("data", "model"))),
    ):
        m = RankFM(factors=20, loss="warp", max_samples=20,
                   learning_rate=0.1, learning_schedule="invscaling",
                   mesh=mesh)
        t0 = time.time()
        m.fit(df, epochs=1)           # warmup/compile
        warm = time.time() - t0
        t0 = time.time()
        m.fit(df, epochs=20)
        dt = time.time() - t0
        rate = 20 * len(df) / dt
        results[label] = rate
        print(f"{label}: fit20={dt:.2f}s rate={rate/1e6:.2f}M rows/s "
              f"(warmup {warm:.1f}s)")

    ratio = results["dp_mesh_1dev"] / results["single"]
    print(f"dp-mesh/single throughput ratio: {ratio:.3f}")


if __name__ == "__main__":
    main()
