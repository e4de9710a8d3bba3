"""rankfm_tpu — a TPU-native factorization-machine retrieval engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`etlundquist/rankfm` (reference: /root/reference): Factorization Machines for
implicit-feedback ranking trained with pairwise BPR/WARP loss, plus top-N
retrieval, similarity search, and offline ranking evaluation — built TPU-first
(batched MXU-friendly scoring, vectorized WARP rejection sampling, sharded
embedding tables over a `jax.sharding.Mesh`).

Public API mirrors the reference (`/root/reference/rankfm/rankfm.py:11`,
`/root/reference/rankfm/evaluation.py`):

    from rankfm_tpu import RankFM
    from rankfm_tpu import evaluation
"""

from rankfm_tpu.models.rankfm import RankFM
from rankfm_tpu import evaluation

__version__ = "0.1.0"

__all__ = ["RankFM", "evaluation", "__version__"]
