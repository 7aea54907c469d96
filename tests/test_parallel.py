"""Mesh/sharding correctness: same program on 1-chip vs 8-chip virtual mesh.

The reference has no fake-cluster story (SURVEY.md §4); here GSPMD on the
8-device virtual CPU mesh substitutes: the batch-sharded eval must produce
the same predictions as the single-device run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madm_tpu.models.madm import MADM, MADMConfig
from madm_tpu.parallel import make_mesh, make_sharded_eval_fn, replicate, shard_batch

TINY = dict(
    num_classes=5,
    crop_size=(64, 64),
    unet_channels=(32, 64, 128, 128),
    vae_channels=(32, 32, 64, 64),
    feature_dims=(3, 32, 64, 128),
    projection_dim=(32, 32, 32, 32),
    compute_dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def tiny_model():
    model = MADM(MADMConfig(**TINY))
    variables = model.init_params(jax.random.PRNGKey(0))
    return model, variables


def test_mesh_shapes():
    mesh = make_mesh(jax.devices()[:8])
    assert dict(mesh.shape) == {"data": 8, "model": 1}


def test_sharded_eval_matches_single_device(tiny_model):
    model, variables = tiny_model
    images = jax.random.uniform(jax.random.PRNGKey(1), (8, 64, 64, 3))

    def eval_fn(variables, images):
        logits = model.eval_forward(variables, images)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    single = jax.jit(eval_fn)(variables, images)

    mesh = make_mesh(jax.devices()[:8])
    sharded_fn = make_sharded_eval_fn(eval_fn, mesh)
    v = replicate(mesh, variables)
    imgs = shard_batch(mesh, images)
    sharded = sharded_fn(v, imgs)

    # identical programs up to reduction order: argmax ids must agree almost
    # everywhere (ties at fp boundaries may flip on a handful of pixels)
    agree = (np.asarray(single) == np.asarray(sharded)).mean()
    assert agree > 0.999, f"agreement {agree}"


def test_zero1_sharding_specs():
    import optax

    from madm_tpu.parallel import zero1_sharding

    mesh = make_mesh(jax.devices()[:8])
    params = {
        "w": jnp.zeros((320, 4)),      # axis 0 divisible by 8
        "k": jnp.zeros((3, 3, 4, 320)),  # only axis 3 divisible
        "b": jnp.zeros((7,)),          # nothing divisible -> replicated
    }
    opt = optax.adamw(1e-3).init(params)
    sh = zero1_sharding(opt, mesh)
    mu = sh[0].mu
    assert mu["w"].spec == jax.sharding.PartitionSpec("data")
    assert mu["k"].spec == jax.sharding.PartitionSpec(None, None, None, "data")
    assert mu["b"].spec == jax.sharding.PartitionSpec()


def test_shard_batch_places_on_data_axis(tiny_model):
    mesh = make_mesh(jax.devices()[:8])
    batch = shard_batch(mesh, {"x": jnp.zeros((8, 4))})
    sharding = batch["x"].sharding
    assert sharding.is_equivalent_to(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")), 2
    )
