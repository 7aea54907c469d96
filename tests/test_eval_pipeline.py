"""End-to-end eval pipeline: dataset -> loader -> inference -> mIoU."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from madm_tpu.data import CrossModalityDataset, TestLoader
from madm_tpu.evaluation import DSECSemSegEvaluator, inference_on_dataset
from madm_tpu.models.madm import MADM, MADMConfig

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
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalset")
    rng = np.random.default_rng(0)
    manifest = {"source_data": {"RGB": [], "label": []},
                "target_data": {"second_modality": [], "label": []}}
    for i in range(3):
        img = rng.integers(0, 255, (48, 80, 3), dtype=np.uint8)
        lbl = rng.integers(0, 5, (48, 80), dtype=np.uint8)
        Image.fromarray(img).save(root / f"img{i}.png")
        Image.fromarray(lbl).save(root / f"lbl{i}.png")
        manifest["target_data"]["second_modality"].append(f"img{i}.png")
        manifest["target_data"]["label"].append(f"lbl{i}.png")
    path = root / "Cityscapes_RGB_to_DSEC_Event_tiny.json"
    path.write_text(json.dumps(manifest))
    return CrossModalityDataset(
        json_path=str(path), target_root_path=str(root),
        train_or_test="test", test_resize_h_w=[64, 64],
    )


def test_inference_on_dataset(dataset):
    model = MADM(MADMConfig(**TINY))
    variables = model.init_params(jax.random.PRNGKey(0))
    loader = TestLoader(dataset)
    ev = DSECSemSegEvaluator(stuff_classes=[f"c{i}" for i in range(5)])
    results = inference_on_dataset(model, variables, loader, ev)
    res = results["sem_seg"]
    assert np.isfinite(res["mIoU"]) or np.isnan(res["mIoU"]) is False
    assert 0.0 <= res["pACC"] <= 100.0
    assert ev.eval_index == 3


def test_mesh_sharded_eval_matches_single_device(dataset):
    """`do_test` mesh path: eval over the 8-device mesh produces the same
    confusion matrix as the single-device loop (incl. tail-group padding —
    3 images into one group of 8)."""
    from madm_tpu.parallel import make_mesh

    model = MADM(MADMConfig(**TINY))
    variables = model.init_params(jax.random.PRNGKey(0))
    ev1 = DSECSemSegEvaluator(stuff_classes=[f"c{i}" for i in range(5)])
    inference_on_dataset(model, variables, TestLoader(dataset), ev1)
    conf1 = ev1._conf_matrix.copy()

    mesh = make_mesh(jax.devices())
    ev2 = DSECSemSegEvaluator(stuff_classes=[f"c{i}" for i in range(5)])
    inference_on_dataset(model, variables, TestLoader(dataset), ev2, mesh=mesh)
    np.testing.assert_array_equal(conf1, ev2._conf_matrix)

    # single-chip batching (MADM_EVAL_BATCH / bench e2e path): batch=2 over
    # 3 images — tail group padded by repetition, padding discarded
    ev3 = DSECSemSegEvaluator(stuff_classes=[f"c{i}" for i in range(5)])
    inference_on_dataset(model, variables, TestLoader(dataset), ev3, batch=2)
    np.testing.assert_array_equal(conf1, ev3._conf_matrix)
    assert ev3.eval_index == 3


def test_test_loader_sharding(dataset):
    l0 = TestLoader(dataset, shard_index=0, num_shards=2)
    l1 = TestLoader(dataset, shard_index=1, num_shards=2)
    assert len(l0) + len(l1) == 3
    names0 = {s["file_name"] for s in l0}
    names1 = {s["file_name"] for s in l1}
    assert not names0 & names1
