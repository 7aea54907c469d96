"""Vis-grid parity units: panel assembly + attention overlay + grid file.

(reference ``mtmadise.py:551-653`` panel set, ``cmdise.py:238-305``
vis_results, ``utils/visualization.py:44-118`` attention overlay.)
"""

import numpy as np

from madm_tpu.train.train_step import TrainConfig
from madm_tpu.train.vis import build_vis_data
from madm_tpu.utils.visualization import (
    CITYSCAPES_PALETTE,
    attention_overlay,
    save_vis_grid,
)

B, H, W, C = 2, 16, 16, 5


def _host(extra=()):
    rng = np.random.default_rng(0)
    host = {
        "source_rgb": rng.random((B, H, W, 3), np.float32),
        "source_pred": rng.random((B, H, W, C), np.float32),
        "source_label": rng.integers(0, C, (B, H, W)).astype(np.int32),
        "target_sec_modal": rng.random((B, H, W, 3), np.float32),
        "target_sec_modal_pl": rng.random((B, H, W, C), np.float32),
        "mixup_modal": rng.random((B, H, W, 3), np.float32),
        "mixup_pred": rng.random((B, H, W, C), np.float32),
        "mixup_label": rng.integers(0, C, (B, H, W)).astype(np.int32),
        "rev_noise_t": np.asarray(40, np.int32),
        "pl_prob": rng.random((B, H, W), np.float32),
        "pseudo_val": np.asarray(0.5, np.float32),
    }
    for k in extra:
        if k == "attention_map":
            host[k] = rng.random((B, 8, 8), np.float32)
        elif k in ("pl_reg",):
            host[k] = rng.random((B, H, W, C), np.float32)
        elif k in ("pl_prob_reg",):
            host[k] = rng.random((B, H, W), np.float32)
        else:
            host[k] = rng.random((B, H, W, 3), np.float32)
    return host


def test_build_vis_data_base_panels():
    tc = TrainConfig(rev_noise_sup=True, rev_noise_end_iter=100,
                     vae_decoder_loss="")
    vis = build_vis_data(_host(), tc, iteration=50)
    infos = [v["info"] for v in vis]
    # the reference's 8 active base panels (mtmadise.py:559-569, target_rgb
    # commented out there) with the rev-noise timestep in the PL title
    assert infos == [
        "source_rgb", "source_pred", "source_label", "target_sec_modal",
        "target_sec_modal_pl_40_t", "mixup_modal", "mixup_pred", "mixup_label",
    ]
    # past rev_noise_end_iter the title reverts
    vis2 = build_vis_data(_host(), tc, iteration=500)
    assert vis2[4]["info"] == "target_sec_modal_pl"


def test_build_vis_data_conditional_panels():
    tc = TrainConfig(rev_noise_sup=False, vae_decoder_loss="st",
                     reg_uncertain=True, mic=True)
    host = _host(extra=(
        "masked_image", "masked_image_pred", "source_vae_decoder_out",
        "target_vae_decoder_out", "pl_reg", "pl_prob_reg", "attention_map",
    ))
    vis = build_vis_data(host, tc, iteration=10)
    infos = [v["info"] for v in vis]
    for want in ("masked_image", "masked_image_pred", "source_vae_decoder_out",
                 "target_vae_decoder_out", "pl_reg", "pl_prob_reg",
                 "pl_prob_0.500", "teacher_cross_attn"):
        assert want in infos, infos
    att = vis[infos.index("teacher_cross_attn")]
    assert att["data_type"] == "attention_maps" and "image" in att


def test_attention_overlay_shapes_and_range():
    img = np.random.default_rng(1).random((H, W, 3)).astype(np.float32)
    attn = np.random.default_rng(2).random((8, 8)).astype(np.float32)
    out = attention_overlay(attn, img)
    assert out.shape == (H, W, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6


def test_save_vis_grid_with_all_panel_types(tmp_path):
    tc = TrainConfig(rev_noise_sup=False, vae_decoder_loss="st",
                     reg_uncertain=True, mic=True)
    host = _host(extra=(
        "masked_image", "masked_image_pred", "source_vae_decoder_out",
        "target_vae_decoder_out", "pl_reg", "pl_prob_reg", "attention_map",
    ))
    vis = build_vis_data(host, tc, iteration=10)
    path = save_vis_grid(vis, str(tmp_path), 10, CITYSCAPES_PALETTE)
    assert path is not None
    import os

    assert os.path.exists(path) and os.path.getsize(path) > 0
