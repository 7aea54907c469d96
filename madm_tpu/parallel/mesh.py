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
    """Place a host batch with axis-0 sharded over the data axis.

    Single-host: a plain sharded device_put.  Multi-host: each process holds
    its *local* slice of the global batch (the dataloader shards by
    ``jax.process_index()``, mirroring the reference's per-rank batch split,
    ``data/build.py:77-100``) and the global array is assembled with
    ``make_array_from_process_local_data`` — device_put cannot address other
    hosts' devices."""
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, s), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)), batch
    )


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


def zero1_sharding(tree, mesh: Mesh):
    """ZeRO-1-style sharding spec for an optimizer-state pytree.

    Each leaf is sharded over the ``data`` axis along its first
    evenly-divisible dimension (scalars and indivisible leaves stay
    replicated).  Adam's m/v are the dominant training memory after the
    params themselves (SURVEY.md §2.3: 'optional optimizer-state sharding
    axis if v5e memory demands'); under GSPMD the moment update runs sharded
    and the parameter update all-gathers implicitly.
    """
    n = mesh.shape["data"]

    def spec(leaf):
        if not hasattr(leaf, "shape"):
            return NamedSharding(mesh, P())
        for i, d in enumerate(leaf.shape):
            if d % n == 0 and d >= n:
                return NamedSharding(mesh, P(*([None] * i + ["data"])))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, tree)


def shard_opt_state(mesh: Mesh, opt_state):
    """Device-put an optimizer state with ZeRO-1 sharding."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), opt_state, zero1_sharding(opt_state, mesh)
    )


def place_state(mesh: Mesh, state, zero1: bool = True):
    """Place a TrainState on the mesh: replicated, with the optimizer state
    ZeRO-1-sharded when the data axis has more than one device."""
    state = replicate(mesh, state)
    if zero1 and mesh.shape["data"] > 1:
        state = state.replace(opt_state=shard_opt_state(mesh, state.opt_state))
    return state


def make_sharded_train_step(step_fn, mesh: Mesh, state=None, zero1: bool = True):
    """jit the train step with the batch data-sharded.

    Params/EMA/consts are replicated; with ``zero1`` (and a ``state``
    template) the optimizer state is sharded over the data axis.  Under GSPMD
    the loss means over the global batch make the gradient all-reduce
    implicit — no explicit collectives needed (SURVEY.md §5 'Distributed
    communication backend')."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    if zero1 and state is not None and mesh.shape["data"] > 1:
        state_shardings = jax.tree.map(lambda _: rep, state)
        state_shardings = state_shardings.replace(
            opt_state=zero1_sharding(state.opt_state, mesh)
        )
        return jax.jit(
            step_fn,
            in_shardings=(state_shardings, bsh, rep),
            out_shardings=(state_shardings, rep),
            donate_argnums=0,
        )
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
