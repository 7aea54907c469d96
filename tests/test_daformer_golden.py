"""Torch goldens for the feature projections and the DAFormer head.

Closes the last numeric-parity blind spot (round-2 verdict weak #3): the
UNet/VAE have full torch goldens, but the mmcv-``ConvModule`` semantics
(conv->BN->ReLU ordering, depthwise-separable with norm/act between DW and
PW — ``/root/reference/modeling/sem_seg_head/daformer_head.py:341-479``),
``align_corners=False`` resizes, and the d2 GN-BottleneckBlock projections
(``/root/reference/modeling/backbone/feature_extractor.py:347-359``) had
none.  The torch side here is hand-written to detectron2/mmcv semantics
(neither library is installed), produces the reference's state-dict key
layout, and is fed through the real checkpoint converter
(``convert_madm_pth``), so a silent ordering or naming mistake fails loudly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from madm_tpu.checkpoint.converter import convert_madm_pth  # noqa: E402
from madm_tpu.models.daformer import DAFormerHead  # noqa: E402
from madm_tpu.models.projections import MultiScaleProjection  # noqa: E402

ATOL = 3e-4


# ---------------------------------------------------------------- torch side


class _D2Conv(nn.Conv2d):
    """detectron2 Conv2d: conv (bias off) with an attached GroupNorm(32)
    applied in forward (d2 ``layers/wrappers.py`` semantics)."""

    def __init__(self, cin, cout, k, dilation=1, padding=0):
        super().__init__(cin, cout, k, padding=padding, dilation=dilation, bias=False)
        self.norm = nn.GroupNorm(32, cout)

    def forward(self, x):
        return self.norm(super().forward(x))


class TorchBottleneckBlock(nn.Module):
    """d2 ResNet BottleneckBlock, stride 1, norm='GN'
    (``feature_extractor.py:347-359`` builds these via ResNet.make_stage)."""

    def __init__(self, cin, bottleneck, cout):
        super().__init__()
        self.conv1 = _D2Conv(cin, bottleneck, 1)
        self.conv2 = _D2Conv(bottleneck, bottleneck, 3, padding=1)
        self.conv3 = _D2Conv(bottleneck, cout, 1)
        if cin != cout:
            self.shortcut = _D2Conv(cin, cout, 1)

    def forward(self, x):
        out = F.relu(self.conv1(x))
        out = F.relu(self.conv2(out))
        out = self.conv3(out)
        sc = self.shortcut(x) if hasattr(self, "shortcut") else x
        return F.relu(out + sc)


class TorchConvModule(nn.Module):
    """mmcv ConvModule with norm_cfg=BN, act_cfg=ReLU: conv(bias off)->BN->ReLU."""

    def __init__(self, cin, cout, k, dilation=1, padding=0, groups=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, padding=padding, dilation=dilation,
                              groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TorchDWSepConvModule(nn.Module):
    """mmcv DepthwiseSeparableConvModule: DW ConvModule (norm+act) then PW
    ConvModule (norm+act) — ``daformer_head.py:383-398`` config."""

    def __init__(self, cin, cout, dilation):
        super().__init__()
        self.depthwise_conv = TorchConvModule(cin, cin, 3, dilation=dilation,
                                              padding=dilation, groups=cin)
        self.pointwise_conv = TorchConvModule(cin, cout, 1)

    def forward(self, x):
        return self.pointwise_conv(self.depthwise_conv(x))


class TorchASPPWrapper(nn.Module):
    """sep=True, pool=False, dilations (1,6,12,18) (``daformer_head.py:414-479``)."""

    def __init__(self, cin, ch, dilations=(1, 6, 12, 18)):
        super().__init__()
        mods = []
        for d in dilations:
            if d == 1:
                mods.append(TorchConvModule(cin, ch, 1))
            else:
                mods.append(TorchDWSepConvModule(cin, ch, d))
        self.aspp_modules = nn.ModuleList(mods)
        self.bottleneck = TorchConvModule(len(dilations) * ch, ch, 3, padding=1)

    def forward(self, x):
        outs = [m(x) for m in self.aspp_modules]
        return self.bottleneck(torch.cat(outs, dim=1))


class TorchMLP(nn.Module):
    """mmseg MLP embed (``daformer_head.py:401-411``)."""

    def __init__(self, cin, embed):
        super().__init__()
        self.proj = nn.Linear(cin, embed)

    def forward(self, x):
        n, c, h, w = x.shape
        y = self.proj(x.flatten(2).transpose(1, 2))
        return y.transpose(1, 2).reshape(n, -1, h, w)


class TorchDAFormerHead(nn.Module):
    """Reference DAFormerHead forward (``daformer_head.py:536-749``):
    per-scale MLP embed -> upsample(align_corners=False) to the largest ->
    concat -> sep-ASPP -> dropout -> [optional concat] -> conv_seg."""

    def __init__(self, in_channels, embed, ch, num_classes,
                 concat_attention=False, final_fuse=False):
        super().__init__()
        self.embed_layers = nn.ModuleDict(
            {str(i): TorchMLP(c, embed) for i, c in enumerate(in_channels)}
        )
        self.fuse_layer = TorchASPPWrapper(embed * len(in_channels), ch)
        self.concat_attention = concat_attention
        self.final_fuse = final_fuse
        if concat_attention:
            self.conv_seg = nn.Conv2d(ch + num_classes, num_classes, 1)
        elif final_fuse:
            self.vae_decoder_feat_proj = nn.Sequential(
                TorchBottleneckBlock(in_channels[0], 32, 64)
            )
            self.conv_seg = nn.Conv2d(ch + 64, num_classes, 1)
        else:
            self.conv_seg = nn.Conv2d(ch, num_classes, 1)

    def forward(self, feats, cross_attention_feat=None):
        x = list(feats)
        vae_decoder_feat = None
        if self.final_fuse:
            vae_decoder_feat = x[0]
            x[0] = F.interpolate(x[0], size=(x[0].shape[-2] // 2, x[0].shape[-1] // 2),
                                 mode="bilinear", align_corners=False)
        os_size = x[0].shape[2:]
        embeds = []
        for i, f in enumerate(x):
            e = self.embed_layers[str(i)](f)
            if e.shape[2:] != os_size:
                e = F.interpolate(e, size=os_size, mode="bilinear", align_corners=False)
            embeds.append(e)
        y = self.fuse_layer(torch.cat(embeds, dim=1))
        # cls_seg: dropout (identity in eval) then optional concat then conv_seg
        if cross_attention_feat is not None:
            att = F.interpolate(cross_attention_feat, size=y.shape[-2:],
                                mode="bilinear", align_corners=False)
            y = torch.cat((y, att), dim=1)
        elif vae_decoder_feat is not None:
            y = F.interpolate(y, size=vae_decoder_feat.shape[-2:],
                              mode="bilinear", align_corners=False)
            y = torch.cat((y, self.vae_decoder_feat_proj(vae_decoder_feat)), dim=1)
        return self.conv_seg(y)


class TorchModel(nn.Module):
    """Key-layout shim: children named like the reference checkpoint roots."""

    def __init__(self, projections, head):
        super().__init__()
        backbone = nn.Module()
        backbone.feature_projections = projections
        self.backbone = backbone
        self.sem_seg_head = head


def _randomize_bn(module, gen):
    """Non-trivial running stats so mean/var conversion mistakes show up."""
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)


# ---------------------------------------------------------------- fixtures

FEATURE_DIMS = (32, 32, 64, 128)   # s0, s3, s4, s5 input channels
PROJ_DIM = (32, 64, 64, 64)
IN_KEYS = ("s0", "s3", "s4", "s5")
SPATIAL = (64, 8, 4, 2)
NUM_CLASSES = 11
EMBED = 32
CH = 32


def _make_torch(gen, concat_attention=False, final_fuse=False):
    projections = nn.ModuleList(
        [nn.Sequential(TorchBottleneckBlock(cin, 32, cout))
         for cin, cout in zip(FEATURE_DIMS, PROJ_DIM)]
    )
    head = TorchDAFormerHead(PROJ_DIM, EMBED, CH, NUM_CLASSES,
                             concat_attention=concat_attention,
                             final_fuse=final_fuse)
    model = TorchModel(projections, head)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.2)
        _randomize_bn(model, gen)
    model.eval()
    return model


def _convert(model):
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    return convert_madm_pth(sd)


def _features(gen):
    return [torch.randn(1, c, s, s, generator=gen)
            for c, s in zip(FEATURE_DIMS, SPATIAL)]


def _nhwc(t):
    return jnp.asarray(t.numpy().transpose(0, 2, 3, 1))


@pytest.mark.parametrize("variant", ["plain", "concat_attention", "final_fuse"])
def test_projections_and_head_golden(variant):
    """fp32 end-to-end (features -> projections -> head -> logits) parity
    vs hand-written torch with d2/mmcv semantics, through the converter."""
    gen = torch.Generator().manual_seed(0)
    tmodel = _make_torch(
        gen,
        concat_attention=(variant == "concat_attention"),
        final_fuse=(variant == "final_fuse"),
    )
    feats = _features(gen)
    att = (torch.randn(1, NUM_CLASSES, SPATIAL[1], SPATIAL[1], generator=gen)
           if variant == "concat_attention" else None)

    with torch.no_grad():
        tproj = [p(f) for p, f in zip(tmodel.backbone.feature_projections, feats)]
        tlogits = tmodel.sem_seg_head(tproj, cross_attention_feat=att)

    tree = _convert(tmodel)
    proj_mod = MultiScaleProjection(
        feature_dims=FEATURE_DIMS, projection_dim=PROJ_DIM,
        out_features=IN_KEYS, bottleneck_channels=32,
    )
    jproj = proj_mod.apply(
        {"params": tree["params"]["projections"]}, [_nhwc(f) for f in feats]
    )
    for name, t in zip(IN_KEYS, tproj):
        np.testing.assert_allclose(
            np.asarray(jproj[name]), t.numpy().transpose(0, 2, 3, 1),
            atol=ATOL, rtol=0, err_msg=f"projection {name}",
        )

    head_mod = DAFormerHead(
        in_keys=IN_KEYS, num_classes=NUM_CLASSES, channels=CH, embed_dims=EMBED,
        concat_attention_to_conv_seg=(variant == "concat_attention"),
        final_fuse_vae_decoder_feat=(variant == "final_fuse"),
    )
    jlogits = head_mod.apply(
        {"params": tree["params"]["head"],
         "batch_stats": tree["state"]["head_bn"]},
        jproj,
        cross_attention_feat=None if att is None else _nhwc(att),
    )
    np.testing.assert_allclose(
        np.asarray(jlogits), tlogits.numpy().transpose(0, 2, 3, 1),
        atol=ATOL, rtol=0, err_msg="head logits",
    )
