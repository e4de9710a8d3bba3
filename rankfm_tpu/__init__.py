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

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache: the fused ML-1M fit compiles in
    ~80 s cold; with the cache warm a fresh process skips straight to
    execution. Opt out with RANKFM_TPU_NO_CACHE=1 or point elsewhere with
    RANKFM_TPU_CACHE_DIR."""
    if _os.environ.get("RANKFM_TPU_NO_CACHE"):
        return
    cache_dir = _os.environ.get(
        "RANKFM_TPU_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "rankfm_tpu_xla"))
    try:
        import jax
        # respect an application-level cache configuration: if the user (or
        # their environment) already points the persistent cache somewhere,
        # don't silently redirect it — and don't override their eviction
        # thresholds either
        if (_os.environ.get("JAX_COMPILATION_CACHE_DIR")
                or getattr(jax.config, "jax_compilation_cache_dir", None)):
            return
        # XLA:CPU cache entries embed host ISA features that the cache key
        # does not fully capture: an AOT payload compiled on another machine
        # deserializes here with a SIGILL-risk warning (observed when the
        # cache volume outlives the host). Partition entries by an ISA
        # fingerprint UNLESS the primary platform is provably a TPU (the
        # only backend where cross-process warm-start must survive host
        # changes; its key includes the chip kind). An unset platform can
        # default to CPU, so unknown also partitions.
        try:
            plats = (getattr(jax.config, "jax_platforms", None)
                     or _os.environ.get("JAX_PLATFORMS", "") or "")
            primary = plats.split(",")[0].strip().lower()
            if primary not in ("tpu", "axon"):
                fp = ""
                try:
                    with open("/proc/cpuinfo") as fh:
                        for line in fh:
                            if line.startswith(("flags", "Features")):
                                import hashlib
                                fp = hashlib.sha1(
                                    line.encode()).hexdigest()[:12]
                                break
                except OSError:
                    pass
                if not fp:
                    import platform
                    fp = platform.machine() or "unknown"
                cache_dir = _os.path.join(cache_dir, f"host-{fp}")
        except Exception:
            pass  # partitioning is best-effort; never lose the cache
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only FS: run uncached


_enable_compilation_cache()

from rankfm_tpu.models.rankfm import RankFM  # noqa: E402
from rankfm_tpu import evaluation  # noqa: E402

__version__ = "0.5.0"

__all__ = ["RankFM", "evaluation", "__version__"]
