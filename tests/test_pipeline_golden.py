"""mIoU-level pipeline golden: equal confusion matrices, torch vs repo.

The strongest in-env stand-in for the env-blocked released-checkpoint parity
run: 3 synthetic images go through

- the *reference eval path* re-created in torch from the hand-written golden
  modules (VAE encode -> add_noise(t=0, shared noise) -> UNet(+cond time
  residual) taps -> VAE decoder s0 -> projections -> DAFormer head ->
  bilinear upsample -> argmax -> bincount confusion matrix;
  ``mtmadise.py:657-691``, ``ldm_diffusers.py:143-217,454-616``,
  ``d2_evaluator.py:89-127``), and
- the repo's full chain: CrossModalityDataset -> TestLoader ->
  ``inference_on_dataset`` -> ``DSECSemSegEvaluator``,

with identical weights flowing through ``checkpoint/converter.py``, and the
test asserts the two (C+1)x(C+1) confusion matrices are **equal** — i.e.
every one of the 3*64*64 argmax decisions agrees.
"""

import json
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from test_daformer_golden import (  # noqa: E402
    TorchBottleneckBlock,
    TorchDAFormerHead,
    TorchModel,
    _randomize_bn,
)
from test_torch_golden import CH, VCH, TUNet, TVaeDecoder, TVaeEncoder  # noqa: E402

from madm_tpu.checkpoint.converter import (  # noqa: E402
    convert_madm_pth,
    convert_unet_state,
    convert_vae_state,
)
from madm_tpu.data import CrossModalityDataset, TestLoader  # noqa: E402
from madm_tpu.evaluation import (  # noqa: E402
    DSECSemSegEvaluator,
    inference_on_dataset,
)
from madm_tpu.models.madm import MADM, MADMConfig  # noqa: E402
from madm_tpu.models.sd.scheduler import alphas_cumprod  # noqa: E402

NUM_CLASSES = 5
FEATURE_DIMS = (3, 32, 64, 128)  # s0 (decoder RGB) + reversed tap channels
PROJ_DIM = (32, 32, 32, 32)
HEAD_CH = 64
EMBED = 256  # DAFormerHead default embed_dims


class TUNetCondTime(TUNet):
    """TUNet + the learnable time-embedding residual added right after the
    time MLP (reference ``ldm_diffusers.py:506-509``)."""

    def forward(self, x, t, ctx, cond_time=None, taps=(5, 8, 11)):
        half = self.ch[0] // 2
        freq = torch.exp(
            -math.log(10000) * torch.arange(half, dtype=torch.float32) / half
        )
        ang = t.float()[:, None] * freq[None]
        t_emb = torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1)
        temb = self.time_embedding.linear_2(
            tF.silu(self.time_embedding.linear_1(t_emb))
        )
        if cond_time is not None:
            temb = temb + cond_time

        x = self.conv_in(x)
        hs = [x]
        for blk in self.down_blocks:
            x = blk(x, temb, ctx, hs)
        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, ctx)
        x = self.mid_block.resnets[1](x, temb)
        feats = []
        idx = 0
        for blk in self.up_blocks:
            for j, r in enumerate(blk.resnets):
                x = torch.cat([x, hs.pop()], dim=1)
                x = r(x, temb)
                if blk.attn:
                    x = blk.attentions[j](x, ctx)
                if idx in taps:
                    feats.append(x)
                idx += 1
            if not blk.last:
                x = tF.interpolate(x, scale_factor=2, mode="nearest")
                x = blk.upsamplers[0].conv(x)
        x = self.conv_out(tF.silu(self.conv_norm_out(x)))
        return x, feats


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeset")
    rng = np.random.default_rng(7)
    manifest = {
        "source_data": {"RGB": [], "label": []},
        "target_data": {"second_modality": [], "label": []},
    }
    for i in range(3):
        img = rng.integers(0, 255, (48, 80, 3), dtype=np.uint8)
        lbl = rng.integers(0, NUM_CLASSES, (48, 80), dtype=np.uint8)
        lbl[0, :4] = 255  # some ignore pixels exercise the C+1 mapping
        Image.fromarray(img).save(root / f"img{i}.png")
        Image.fromarray(lbl).save(root / f"lbl{i}.png")
        manifest["target_data"]["second_modality"].append(f"img{i}.png")
        manifest["target_data"]["label"].append(f"lbl{i}.png")
    path = root / "Cityscapes_RGB_to_DSEC_Event_tiny.json"
    path.write_text(json.dumps(manifest))
    return CrossModalityDataset(
        json_path=str(path),
        target_root_path=str(root),
        train_or_test="test",
        test_resize_h_w=[64, 64],
    )


def _build_torch_weights():
    """Hand-built torch model set with non-trivial weights."""
    gen = torch.Generator().manual_seed(11)
    torch.manual_seed(11)
    tvae_enc = TVaeEncoder().eval()
    quant = tnn.Conv2d(8, 8, 1).eval()
    tvae_dec = TVaeDecoder().eval()
    pq = tnn.Conv2d(4, 4, 1).eval()
    tunet = TUNetCondTime().eval()
    projections = tnn.ModuleList(
        [
            tnn.Sequential(TorchBottleneckBlock(cin, 128, cout))
            for cin, cout in zip(FEATURE_DIMS, PROJ_DIM)
        ]
    )
    head = TorchDAFormerHead(PROJ_DIM, EMBED, HEAD_CH, NUM_CLASSES)
    tmodel = TorchModel(projections, head)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.2)
        _randomize_bn(tmodel, gen)
    tmodel.eval()
    return tvae_enc, quant, tvae_dec, pq, tunet, tmodel


def _graft_variables(model, tvae_enc, quant, tvae_dec, pq, tunet, tmodel):
    """Flax variables with every weight converted from the torch modules."""
    variables = model.init_params(jax.random.PRNGKey(0))

    enc_sd = {"encoder." + k: v.numpy() for k, v in tvae_enc.state_dict().items()}
    enc_sd["quant_conv.weight"] = quant.weight.detach().numpy()
    enc_sd["quant_conv.bias"] = quant.bias.detach().numpy()
    enc_params, _ = convert_vae_state(enc_sd)

    dec_sd = {"decoder." + k: v.numpy() for k, v in tvae_dec.state_dict().items()}
    dec_sd["post_quant_conv.weight"] = pq.weight.detach().numpy()
    dec_sd["post_quant_conv.bias"] = pq.bias.detach().numpy()
    _, dec_params = convert_vae_state(dec_sd)

    unet_params = convert_unet_state(
        {k: v.numpy() for k, v in tunet.state_dict().items()}
    )
    tree = convert_madm_pth({k: v.numpy() for k, v in tmodel.state_dict().items()})

    variables["params"]["vae_encoder"] = enc_params
    variables["params"]["vae_decoder"] = dec_params
    variables["params"]["unet"] = unet_params
    variables["params"]["projections"] = tree["params"]["projections"]
    variables["params"]["head"] = tree["params"]["head"]
    variables["state"]["head_bn"] = tree["state"]["head_bn"]
    return variables


def _torch_eval_path(img01, variables, model, mods):
    """Reference eval semantics in torch -> pred ids [H, W]."""
    tvae_enc, quant, tvae_dec, pq, tunet, tmodel = mods
    acp = np.asarray(alphas_cumprod())
    shared = torch.from_numpy(
        np.asarray(variables["consts"]["shared_noise"]).transpose(0, 3, 1, 2).copy()
    )
    cp, ct = model.conditioning(variables, "others", batch_size=1)
    cp_t = torch.from_numpy(np.asarray(cp))
    ct_t = None if ct is None else torch.from_numpy(np.asarray(ct))
    if ct_t is not None and ct_t.ndim == 3:  # [B, 1, dim] -> [B, dim]
        ct_t = ct_t[:, 0]  # ldm_diffusers.py:506-508

    x = torch.from_numpy(img01.transpose(0, 3, 1, 2)).float() * 2.0 - 1.0
    with torch.no_grad():
        moments = quant(tvae_enc(x))
        latents = moments[:, :4] * 0.18215  # posterior mean (deterministic)
        # add_noise at t=0 with the fixed shared-noise buffer
        noise = shared.expand_as(latents)
        noisy = (
            math.sqrt(acp[0]) * latents + math.sqrt(1.0 - acp[0]) * noise
        ).float()
        eps, taps = tunet(noisy, torch.zeros(1, dtype=torch.long), cp_t, ct_t)
        dec_rgb = tvae_dec(pq(eps / 0.18215))
        feats = [dec_rgb, taps[2], taps[1], taps[0]]  # s0, idx11, idx8, idx5
        proj = [p(f) for p, f in zip(tmodel.backbone.feature_projections, feats)]
        logits = tmodel.sem_seg_head(proj)
        logits = tF.interpolate(
            logits.float(), size=img01.shape[1:3], mode="bilinear",
            align_corners=False,
        )
        return logits.argmax(dim=1)[0].numpy()


def test_pipeline_confusion_matrix_golden(dataset):
    cfg = MADMConfig(
        num_classes=NUM_CLASSES,
        crop_size=(64, 64),
        unet_channels=CH,
        vae_channels=VCH,
        feature_dims=FEATURE_DIMS,
        projection_dim=PROJ_DIM,
        head_channels=HEAD_CH,
        compute_dtype=jnp.float32,
    )
    model = MADM(cfg)
    mods = _build_torch_weights()
    variables = _graft_variables(model, *mods)

    # ---- repo chain: dataset -> loader -> inference -> evaluator
    loader = TestLoader(dataset)
    evaluator = DSECSemSegEvaluator(
        stuff_classes=[f"c{i}" for i in range(NUM_CLASSES)],
        ignore_label=255,
    )
    metrics = inference_on_dataset(model, variables, loader, evaluator)
    repo_conf = evaluator._conf_matrix.copy()
    assert np.isfinite(metrics["sem_seg"]["mIoU"])

    # ---- reference eval path in torch (d2_evaluator.py:114-127 conf matrix)
    torch_conf = np.zeros((NUM_CLASSES + 1, NUM_CLASSES + 1), dtype=np.int64)
    for sample in loader:
        pred = _torch_eval_path(
            sample["target_second_modality"], variables, model, mods
        )
        gt = np.asarray(sample["target_label"], dtype=np.int32).copy()
        if gt.ndim == 3:
            gt = gt[0]
        gt[gt == 255] = NUM_CLASSES
        torch_conf += np.bincount(
            (NUM_CLASSES + 1) * pred.reshape(-1).astype(np.int64)
            + gt.reshape(-1),
            minlength=torch_conf.size,
        ).reshape(torch_conf.shape)

    assert torch_conf.sum() == repo_conf.sum() == 3 * 64 * 64
    np.testing.assert_array_equal(repo_conf, torch_conf)
