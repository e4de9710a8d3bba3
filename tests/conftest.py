"""Test configuration: run everything on CPU with 8 virtual devices so the
sharded-table / sharded-top-k logic is testable without a TPU pod
(SURVEY.md §4 implication).

NOTE: this environment pre-imports jax at interpreter startup (axon
sitecustomize) with JAX_PLATFORMS=axon, so env vars set here are too late —
use jax.config.update, which works any time before backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
