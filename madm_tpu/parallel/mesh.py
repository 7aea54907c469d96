"""Device mesh + sharding utilities (GSPMD data parallelism).

The reference's entire distribution story is NCCL DDP over detectron2's
launcher (``main.py:819-828``, ``main.py:290-294``, SURVEY.md §2.3).  The
TPU-native equivalent collapses the communication layer into sharding
annotations: one ``jax.sharding.Mesh`` with a ``data`` axis; batches sharded
on axis 0; parameters/optimizer state replicated (the 860M-param model fits
per chip).  Gradient all-reduce becomes an XLA-inserted psum under jit.

A ``model`` axis is reserved for future tensor parallelism; with
``model=1`` today every sharding degenerates to pure DP.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    data_axis: Optional[int] = None,
    model_axis: int = 1,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_axis is None:
        data_axis = n // model_axis
    assert data_axis * model_axis == n, (data_axis, model_axis, n)
    dev_array = np.asarray(devices).reshape(data_axis, model_axis)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with axis-0 sharded over the data axis."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


def make_sharded_train_step(step_fn, mesh: Mesh):
    """jit the train step with state replicated and the batch data-sharded.

    Under GSPMD the loss means over the global batch make the gradient
    all-reduce implicit — no explicit collectives needed (SURVEY.md §5
    'Distributed communication backend')."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, bsh, rep),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )


def make_sharded_eval_fn(eval_fn, mesh: Mesh):
    """jit an eval fn (variables, images) with images batch-sharded —
    the TPU replacement for the reference's sequential sliding-window loop
    (``feature_extractor.py:199-278``): crops ride the data axis."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(eval_fn, in_shardings=(rep, bsh), out_shardings=bsh)
