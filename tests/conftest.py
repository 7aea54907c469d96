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
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu", (
    f"test harness needs 8 virtual CPU devices, got {jax.devices()}"
)

# modules dominated by multi-minute XLA:CPU compiles (full train-step /
# sliding-window / surgery jits) — the fast gate is `pytest -m "not slow"`,
# the full suite stays the pre-commit gate (see CLAUDE.md)
_SLOW_MODULES = {
    "test_cli_smoke",
    "test_train_step",
    "test_slide_inference",
    "test_conv_in_surgery",
    "test_finetune_unet",
    "test_eval_pipeline",
    "test_pipeline_golden",
    "test_torch_golden",
    "test_fullwidth_golden",
    "test_daformer_golden",
    "test_ldm_extractor",
    "test_fused_head",
    "test_attention_features",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
