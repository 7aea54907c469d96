"""Rare-class sampling math + re-crop loop (reference
``data/dataset/cross_modality_dataset.py:87-109,242-264,302-318``).

Goldens the temperature-softmax class probabilities on a tiny synthetic
``sample_class_stats.json`` against hand-computed values, and asserts the
re-crop loop's guarantee: it retries (up to 10x) until the sampled crop
keeps ``rcs_min_pixels * rcs_min_crop_ratio`` pixels of the drawn class,
returning the last crop if none qualifies (the reference's bounded loop).
"""

import json

import numpy as np
import pytest
from PIL import Image

from madm_tpu.data.dataset import CrossModalityDataset, get_rcs_class_probs


@pytest.fixture()
def stats_root(tmp_path):
    # class 0: 600+400=1000 px across two files, class 1: 100, class 2: 10
    stats = [
        {"file": "a.png", "0": 600, "1": 100},
        {"file": "b.png", "0": 400, "2": 10},
    ]
    (tmp_path / "sample_class_stats.json").write_text(json.dumps(stats))
    return tmp_path


def test_rcs_probs_golden(stats_root):
    classes, probs = get_rcs_class_probs(str(stats_root), temperature=0.01)
    # classes sorted ascending by total pixel count (reference :99-102)
    assert classes == [2, 1, 0]
    # hand-computed: counts (10, 100, 1000), total 1110
    #   freq      = (10, 100, 1000)/1110
    #   logits    = (1 - freq)/T = (99.0990991, 90.990991, 9.90990991)
    #   softmax   -> (0.999699003, 3.00997334e-4, 1.8429e-39)
    np.testing.assert_allclose(
        probs, [0.999699003, 3.00997334e-4, 1.8429e-39],
        rtol=1e-5, atol=1e-12)
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-12)


def test_rcs_probs_high_temperature_uniform(stats_root):
    # T -> inf: logits/T -> 0, softmax -> uniform over present classes
    _, probs = get_rcs_class_probs(str(stats_root), temperature=1e9)
    np.testing.assert_allclose(probs, [1 / 3] * 3, rtol=1e-6)


@pytest.fixture()
def rcs_dataset(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    lbl = np.full((32, 32), 5, np.uint8)  # all one rare class
    Image.fromarray(img).save(tmp_path / "src0.png")
    Image.fromarray(lbl).save(tmp_path / "lbl0.png")
    Image.fromarray(img).save(tmp_path / "tgt0.png")
    manifest = {
        "source_data": {"RGB": ["src0.png"], "label": ["lbl0.png"]},
        "target_data": {"second_modality": ["tgt0.png"]},
    }
    (tmp_path / "train.json").write_text(json.dumps(manifest))
    (tmp_path / "sample_class_stats.json").write_text(
        json.dumps([{"file": "lbl0.png", "5": 1024}]))
    (tmp_path / "samples_with_class.json").write_text(
        json.dumps({"5": [["lbl0.png", 4096]]}))
    return CrossModalityDataset(
        json_path=str(tmp_path / "train.json"),
        source_root_path=str(tmp_path),
        target_root_path=str(tmp_path),
        source_resize_h_w=(64, 64),
        source_crop_size_h_w=(48, 48),
        target_resize_h_w=(64, 64),
        target_crop_size_h_w=(48, 48),
        train_or_test="train",
        rare_class_sample=True,
        seed=0,
    )


def test_rcs_wiring_end_to_end(rcs_dataset):
    """_init_rcs builds probs/file maps; __getitem__ routes through
    get_rare_class_sample and the crop satisfies the pixel guarantee."""
    assert rcs_dataset.rcs_classes == [5]
    np.testing.assert_allclose(rcs_dataset.rcs_classprob, [1.0])
    assert rcs_dataset.samples_with_class[5] == ["lbl0.png"]
    item = rcs_dataset[0]
    lbl = item["source_label"]
    thresh = (CrossModalityDataset.rcs_min_pixels
              * CrossModalityDataset.rcs_min_crop_ratio)
    assert (lbl == 5).sum() > thresh


def test_rcs_recrop_loop_retries_until_enough_pixels(rcs_dataset, monkeypatch):
    """First crops miss the class; the loop re-crops until one qualifies."""
    good = {"rgb": np.zeros((48, 48, 3), np.float32),
            "label": np.full((48, 48), 5, np.int32)}
    bad = {"rgb": np.zeros((48, 48, 3), np.float32),
           "label": np.zeros((48, 48), np.int32)}
    calls = []

    def fake_get_source_data(idx):
        calls.append(idx)
        return dict(bad if len(calls) < 4 else good)

    monkeypatch.setattr(rcs_dataset, "get_source_data", fake_get_source_data)
    s = rcs_dataset.get_rare_class_sample()
    # 1 initial draw + 3 re-crops (2 bad retries, 4th call is good)
    assert len(calls) == 4
    assert (s["label"] == 5).all()


def test_rcs_recrop_loop_bounded_at_10(rcs_dataset, monkeypatch):
    """No crop ever qualifies: exactly 1 + 10 draws, last crop returned
    anyway (reference :308-318 — the loop is bounded, not an assert)."""
    bad = {"rgb": np.zeros((48, 48, 3), np.float32),
           "label": np.zeros((48, 48), np.int32)}
    calls = []

    def fake_get_source_data(idx):
        calls.append(idx)
        return dict(bad)

    monkeypatch.setattr(rcs_dataset, "get_source_data", fake_get_source_data)
    s = rcs_dataset.get_rare_class_sample()
    assert len(calls) == 11
    assert (s["label"] == 0).all()
