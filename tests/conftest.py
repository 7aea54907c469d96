"""Test harness: force CPU with 8 virtual devices for multi-chip sharding tests.

(SURVEY.md §4: multi-chip correctness is validated on a virtual CPU mesh.)

Gotcha on this host: a PYTHONPATH sitecustomize (``/root/.axon_site``)
imports jax at interpreter startup with ``JAX_PLATFORMS=axon`` (the tunneled
TPU), so *environment variables set later are ignored* — the only working
override is ``jax.config.update`` before first backend use.
"""

import os

# single-core host: torch OpenMP threads deadlock against XLA's thread pool
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")
try:
    import torch

    torch.set_num_threads(1)
except ImportError:
    pass

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu", (
    f"test harness needs 8 virtual CPU devices, got {jax.devices()}"
)
