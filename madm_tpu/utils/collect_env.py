"""Environment report at startup (reference: ``utils/collect_env.py:63+``)."""

from __future__ import annotations

import os
import platform
import sys


def collect_env_info() -> str:
    rows = []

    def add(k, v):
        rows.append(f"{k:<30} {v}")

    add("sys.platform", sys.platform)
    add("Python", sys.version.replace("\n", ""))
    add("numpy", __import__("numpy").__version__)
    try:
        import jax

        add("jax", jax.__version__)
        add("jaxlib backend", jax.default_backend())
        add("devices", ", ".join(str(d) for d in jax.devices()))
        add("process_index/count", f"{jax.process_index()}/{jax.process_count()}")
    except Exception as e:  # pragma: no cover
        add("jax", f"unavailable ({e})")
    try:
        import flax

        add("flax", flax.__version__)
    except ImportError:
        pass
    try:
        import optax

        add("optax", optax.__version__)
    except ImportError:
        pass
    add("hostname", platform.node())
    add("XLA_FLAGS", os.environ.get("XLA_FLAGS", ""))
    return "\n".join(rows)
