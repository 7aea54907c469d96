"""Torch goldens at the REAL SD-v1.4 channel widths (round-4 verdict weak #4).

Every other model golden runs at toy widths (unet (32,64,128,128), vae
(32,32,64,64)); width-dependent bugs — converter index merging at
320/640/1280, GroupNorm groups=32 against the real channel counts, the
heads=8/D=40 split in attention, tap channel ordering (3/320/640/1280) —
were structurally invisible to the suite.  These tests build the
hand-written torch references from ``test_torch_golden.py`` /
``test_pipeline_golden.py`` at the full widths

- UNet  block_out_channels (320, 640, 1280, 1280), heads 8 (D = 40/80/160),
  temb 1280  (``/root/reference/modeling/meta_arch/ldm_diffusers.py:454-616``)
- VAE   block_out_channels (128, 256, 512, 512)
- projections (3, 320, 640, 1280) -> (128, 512, 512, 512), bottleneck 128,
  DAFormer embed 256 / fuse 256
  (``/root/reference/modeling/meta_arch/ldm_diffusers.py:17-32``,
  ``feature_extractor.py:347-359``)

at reduced spatial size (64x64 image -> 8x8 latent) so time/memory stay
testable on this 1-core host, run the weights through the real
``checkpoint/converter.py``, and compare fp32 outputs.

atol note: the tiny-width goldens hold 3e-4; contractions here are 10-40x
wider (error ~ sqrt(K) for K-length fp32 dot reductions), so the UNet/chain
bounds scale to 1.5e-3 on O(1) outputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_daformer_golden import (  # noqa: E402
    TorchBottleneckBlock,
    TorchDAFormerHead,
    TorchModel,
    _randomize_bn,
)
from test_pipeline_golden import TUNetCondTime, _torch_eval_path  # noqa: E402
from test_torch_golden import (  # noqa: E402
    TVaeDecoder,
    TVaeEncoder,
    from_nhwc,
    to_nhwc,
)

from madm_tpu.checkpoint.converter import (  # noqa: E402
    convert_madm_pth,
    convert_unet_state,
    convert_vae_state,
)
from madm_tpu.models.madm import MADM, MADMConfig  # noqa: E402
from madm_tpu.models.sd.unet import UNet2DCondition  # noqa: E402
from madm_tpu.models.sd.vae import Decoder as FlaxDecoder  # noqa: E402
from madm_tpu.models.sd.vae import Encoder as FlaxEncoder  # noqa: E402

SD_CH = (320, 640, 1280, 1280)  # real UNet widths
SD_VCH = (128, 256, 512, 512)  # real VAE widths
FEATURE_DIMS = (3, 320, 640, 1280)  # s0 RGB + reversed tap channels
PROJ_DIM = (128, 512, 512, 512)
HEAD_CH = 256
NUM_CLASSES = 11


def _small_init(module, seed):
    """~N(0, 0.03) weights: keeps 1280-wide fp32 activations O(1) so atol
    comparisons stay meaningful through 20+ layers."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.03)


def test_unet_fullwidth_golden():
    tu = TUNetCondTime(ch=SD_CH).eval()
    _small_init(tu, 3)
    x = torch.randn(1, 4, 8, 8, generator=torch.Generator().manual_seed(4))
    t = torch.tensor([0])
    ctx = torch.randn(1, 7, 768, generator=torch.Generator().manual_seed(5))
    with torch.no_grad():
        ref, ref_feats = tu(x, t, ctx)
    assert [f.shape[1] for f in ref_feats] == [1280, 640, 320]

    params = convert_unet_state({k: v.numpy() for k, v in tu.state_dict().items()})
    fu = UNet2DCondition(unet_block_indices=(5, 8, 11),
                         unet_block_indices_type="after",
                         block_out_channels=SD_CH)
    eps, feats = jax.jit(
        lambda p, a, tt, c: fu.apply({"params": p}, a, tt, c)
    )(params, to_nhwc(x), jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(from_nhwc(eps), ref.numpy(), atol=1.5e-3)
    for f, rf in zip(feats, ref_feats):
        np.testing.assert_allclose(from_nhwc(f), rf.numpy(), atol=1.5e-3)


def test_vae_fullwidth_golden():
    te = TVaeEncoder(vch=SD_VCH).eval()
    quant = tnn.Conv2d(8, 8, 1).eval()
    td = TVaeDecoder(vch=SD_VCH).eval()
    pq = tnn.Conv2d(4, 4, 1).eval()
    for m, s in ((te, 6), (quant, 7), (td, 8), (pq, 9)):
        _small_init(m, s)
    x = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(10))
    z = torch.randn(1, 4, 8, 8, generator=torch.Generator().manual_seed(11))
    with torch.no_grad():
        ref_lat = quant(te(x))[:, :4] * 0.18215
        ref_img = td(pq(z / 0.18215))

    enc_sd = {"encoder." + k: v.numpy() for k, v in te.state_dict().items()}
    enc_sd["quant_conv.weight"] = quant.weight.detach().numpy()
    enc_sd["quant_conv.bias"] = quant.bias.detach().numpy()
    enc_params, _ = convert_vae_state(enc_sd)
    dec_sd = {"decoder." + k: v.numpy() for k, v in td.state_dict().items()}
    dec_sd["post_quant_conv.weight"] = pq.weight.detach().numpy()
    dec_sd["post_quant_conv.bias"] = pq.bias.detach().numpy()
    _, dec_params = convert_vae_state(dec_sd)

    fe = FlaxEncoder(block_out_channels=SD_VCH)
    lat, _ = jax.jit(lambda p, a: fe.apply({"params": p}, a))(enc_params, to_nhwc(x))
    np.testing.assert_allclose(from_nhwc(lat), ref_lat.numpy(), atol=5e-4)

    fd = FlaxDecoder(block_out_channels=SD_VCH)
    out, _ = jax.jit(lambda p, a: fd.apply({"params": p}, a))(dec_params, to_nhwc(z))
    np.testing.assert_allclose(from_nhwc(out), ref_img.numpy(), atol=5e-4)


def test_fullchain_fullwidth_golden():
    """64x64 image -> VAE-enc -> add_noise(t=0) -> UNet taps -> VAE-dec s0 ->
    projections -> DAFormer head -> upsampled logits, torch vs repo, with
    every weight flowing through the converter at the real widths
    (``mtmadise.py:657-691`` eval semantics)."""
    cfg = MADMConfig(
        num_classes=NUM_CLASSES,
        crop_size=(64, 64),
        unet_channels=SD_CH,
        vae_channels=SD_VCH,
        feature_dims=FEATURE_DIMS,
        projection_dim=PROJ_DIM,
        head_channels=HEAD_CH,
        compute_dtype=jnp.float32,
    )
    model = MADM(cfg)

    tvae_enc = TVaeEncoder(vch=SD_VCH).eval()
    quant = tnn.Conv2d(8, 8, 1).eval()
    tvae_dec = TVaeDecoder(vch=SD_VCH).eval()
    pq = tnn.Conv2d(4, 4, 1).eval()
    tunet = TUNetCondTime(ch=SD_CH).eval()
    projections = tnn.ModuleList(
        [tnn.Sequential(TorchBottleneckBlock(cin, 128, cout))
         for cin, cout in zip(FEATURE_DIMS, PROJ_DIM)]
    )
    head = TorchDAFormerHead(PROJ_DIM, 256, HEAD_CH, NUM_CLASSES)
    tmodel = TorchModel(projections, head)
    for m, s in ((tvae_enc, 12), (quant, 13), (tvae_dec, 14), (pq, 15),
                 (tunet, 16), (tmodel, 17)):
        _small_init(m, s)
    _randomize_bn(tmodel, torch.Generator().manual_seed(18))
    tmodel.eval()

    variables = model.init_params(jax.random.PRNGKey(0))
    enc_sd = {"encoder." + k: v.numpy() for k, v in tvae_enc.state_dict().items()}
    enc_sd["quant_conv.weight"] = quant.weight.detach().numpy()
    enc_sd["quant_conv.bias"] = quant.bias.detach().numpy()
    variables["params"]["vae_encoder"], _ = convert_vae_state(enc_sd)
    dec_sd = {"decoder." + k: v.numpy() for k, v in tvae_dec.state_dict().items()}
    dec_sd["post_quant_conv.weight"] = pq.weight.detach().numpy()
    dec_sd["post_quant_conv.bias"] = pq.bias.detach().numpy()
    _, variables["params"]["vae_decoder"] = convert_vae_state(dec_sd)
    variables["params"]["unet"] = convert_unet_state(
        {k: v.numpy() for k, v in tunet.state_dict().items()}
    )
    tree = convert_madm_pth({k: v.numpy() for k, v in tmodel.state_dict().items()})
    variables["params"]["projections"] = tree["params"]["projections"]
    variables["params"]["head"] = tree["params"]["head"]
    variables["state"]["head_bn"] = tree["state"]["head_bn"]

    rng = np.random.default_rng(19)
    img01 = rng.random((1, 64, 64, 3), dtype=np.float32)

    mods = (tvae_enc, quant, tvae_dec, pq, tunet, tmodel)
    ref_ids = _torch_eval_path(img01, variables, model, mods)

    ids = jax.jit(model.eval_forward_ids)(variables, jnp.asarray(img01))
    ids = np.asarray(ids[0])

    # at full width a handful of near-tie argmax pixels may legitimately
    # flip under fp32 reassociation; require >= 99.9% agreement (tiny-width
    # pipeline golden holds exact equality — this pins the real widths)
    agree = (ids == ref_ids).mean()
    assert agree >= 0.999, f"argmax agreement {agree:.4%}"
