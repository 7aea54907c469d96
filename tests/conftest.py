"""Test harness: force CPU with 8 virtual devices for multi-chip sharding tests.

(SURVEY.md §4: multi-chip correctness is validated on a virtual CPU mesh via
``--xla_force_host_platform_device_count``.)
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# single-core host: torch OpenMP threads deadlock against XLA's thread pool
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")
try:
    import torch

    torch.set_num_threads(1)
except ImportError:
    pass
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
