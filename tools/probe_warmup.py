"""Probe: decompose cold fit() warmup at ML-1M shape.

Times each phase of the first fit in a fresh process: ingest (id maps +
CSR), history pack, records layout, table extension, epoch-program
compile+run, pull-back. Run twice back-to-back (two processes) to see what
the persistent compilation cache saves:

    python tools/probe_warmup.py && python tools/probe_warmup.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

t_imp0 = time.time()
import jax  # noqa: E402
from rankfm_tpu import RankFM  # noqa: E402
t_imp = time.time() - t_imp0

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench  # noqa: E402

rng = np.random.default_rng(1492)
inter = bench.make_synthetic(rng)

model = RankFM(factors=20, loss="warp", max_samples=20, alpha=0.01,
               sigma=0.1, learning_rate=0.1, learning_schedule="invscaling")

t0 = time.time()
model._init_all(inter, None, None, None)
jax.block_until_ready(model._x_uf_dev)
t_ingest = time.time() - t0

# NOTE: fit_partial re-runs ingest (model not yet fit), so first_fit
# includes a second ingest pass — subtract t_ingest for the pure
# compile+epoch cost.
t0 = time.time()
model.fit_partial(inter, epochs=1)
t_first = time.time() - t0

t0 = time.time()
model.fit_partial(inter, epochs=1)
t_second = time.time() - t0

print(f"import={t_imp:.1f}s ingest={t_ingest:.1f}s "
      f"first_fit(compile+epoch)={t_first:.1f}s steady_epoch={t_second:.2f}s "
      f"device={jax.devices()[0].platform}")
