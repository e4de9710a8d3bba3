"""Test configuration: by default run everything on CPU with 8 virtual
devices so the sharded-table / sharded-top-k logic is testable without a TPU
pod (SURVEY.md §4 implication).

With ``RANKFM_TPU_TEST_TPU=1`` the real device is kept instead, so the
TPU-gated tests (fused kernel, Pallas scatter, scaled parity) actually run —
``make test-tpu`` uses this.

NOTE: this environment pre-imports jax at interpreter startup (axon
sitecustomize) with JAX_PLATFORMS=axon, so env vars set here are too late —
use jax.config.update, which works any time before backend initialization.
"""

import os

import jax

if not os.environ.get("RANKFM_TPU_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
