"""END-TO-END numeric golden tests vs hand-written torch reference models.

The reference's value is its trained SD-v1.4 checkpoints; these tests pin the
FULL forward math (not just per-block shapes) against independent torch
implementations of the diffusers semantics (``ldm_diffusers.py:284-616``):

- tiny ``UNet2DConditionModel``: timestep sinusoid + MLP, conv_in, 3 cross-
  attn down blocks + plain down block, skip stack order, mid, 4 up blocks
  with skip concat, Transformer2D (GN eps 1e-6, proj_in/out, GEGLU), taps;
- tiny ``AutoencoderKL``: encoder/decoder with eps-1e-6 GroupNorms,
  asymmetric-pad downsample, single-head mid attention, posterior mean
  x 0.18215.

Weights flow through ``checkpoint/converter.py`` exactly like a real
snapshot, so a wrong epsilon / activation / concat order fails here.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from madm_tpu.checkpoint.converter import (  # noqa: E402
    convert_unet_state,
    convert_vae_state,
)
from madm_tpu.models.sd.unet import UNet2DCondition  # noqa: E402
from madm_tpu.models.sd.vae import Decoder as FlaxDecoder  # noqa: E402
from madm_tpu.models.sd.vae import Encoder as FlaxEncoder  # noqa: E402

CH = (32, 64, 128, 128)  # tiny UNet widths
VCH = (32, 32, 64, 64)  # tiny VAE widths
CTX = 768
HEADS = 8


def to_nhwc(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def from_nhwc(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


# --------------------------------------------------------------- torch UNet
class TResnet(tnn.Module):
    def __init__(self, cin, cout, temb=None, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(32, cin, eps=eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        if temb:
            self.time_emb_proj = tnn.Linear(temb, cout)
        self.norm2 = tnn.GroupNorm(32, cout, eps=eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(tF.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(tF.silu(temb))[:, :, None, None]
        h = self.conv2(tF.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


class TAttn(tnn.Module):
    def __init__(self, dim, kv_dim, heads):
        super().__init__()
        self.to_q = tnn.Linear(dim, dim, bias=False)
        self.to_k = tnn.Linear(kv_dim, dim, bias=False)
        self.to_v = tnn.Linear(kv_dim, dim, bias=False)
        setattr(self, "to_out", tnn.ModuleList([tnn.Linear(dim, dim)]))
        self.heads = heads

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, s, c = x.shape
        h, d = self.heads, c // self.heads
        q = self.to_q(x).view(b, s, h, d).transpose(1, 2)
        k = self.to_k(ctx).view(b, ctx.shape[1], h, d).transpose(1, 2)
        v = self.to_v(ctx).view(b, ctx.shape[1], h, d).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-1, -2) * d ** -0.5, dim=-1)
        return self.to_out[0]((a @ v).transpose(1, 2).reshape(b, s, c))


class TGeglu(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = tnn.Linear(dim, dim * 8)

    def forward(self, x):
        a, g = self.proj(x).chunk(2, dim=-1)
        return a * tF.gelu(g)


class TBasicBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TAttn(dim, dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TAttn(dim, CTX, heads)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = tnn.Sequential()
        self.ff.net = tnn.ModuleList([TGeglu(dim), tnn.Identity(), tnn.Linear(dim * 4, dim)])

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff.net[2](self.ff.net[0](self.norm3(x)))


class TTransformer2D(tnn.Module):
    def __init__(self, ch, heads):
        super().__init__()
        self.norm = tnn.GroupNorm(32, ch, eps=1e-6)
        self.proj_in = tnn.Linear(ch, ch)
        self.transformer_blocks = tnn.ModuleList([TBasicBlock(ch, heads)])
        self.proj_out = tnn.Linear(ch, ch)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        x = self.norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        x = self.proj_in(x)
        x = self.transformer_blocks[0](x, ctx)
        x = self.proj_out(x)
        return x.reshape(b, h, w, c).permute(0, 3, 1, 2) + res


class TDown(tnn.Module):
    def __init__(self, cin, cout, temb, attn, last, heads=HEADS):
        super().__init__()
        self.resnets = tnn.ModuleList([TResnet(cin, cout, temb), TResnet(cout, cout, temb)])
        if attn:
            self.attentions = tnn.ModuleList([TTransformer2D(cout, heads) for _ in range(2)])
        if not last:
            self.downsamplers = tnn.ModuleList([tnn.Module()])
            self.downsamplers[0].conv = tnn.Conv2d(cout, cout, 3, stride=2, padding=1)
        self.attn = attn
        self.last = last

    def forward(self, x, temb, ctx, hs):
        for i, r in enumerate(self.resnets):
            x = r(x, temb)
            if self.attn:
                x = self.attentions[i](x, ctx)
            hs.append(x)
        if not self.last:
            x = self.downsamplers[0].conv(x)
            hs.append(x)
        return x


class TUp(tnn.Module):
    def __init__(self, cin_skip3, cprev, cout, temb, attn, last, heads=HEADS):
        # cin per resnet = prev_out + popped skip channels
        super().__init__()
        self.resnets = tnn.ModuleList()
        self.attn = attn
        self.last = last
        self.skips = cin_skip3
        prev = cprev
        for j in range(3):
            self.resnets.append(TResnet(prev + cin_skip3[j], cout, temb))
            prev = cout
        if attn:
            self.attentions = tnn.ModuleList([TTransformer2D(cout, heads) for _ in range(3)])
        if not last:
            self.upsamplers = tnn.ModuleList([tnn.Module()])
            self.upsamplers[0].conv = tnn.Conv2d(cout, cout, 3, padding=1)

    def forward(self, x, temb, ctx, hs):
        for j, r in enumerate(self.resnets):
            x = torch.cat([x, hs.pop()], dim=1)
            x = r(x, temb)
            if self.attn:
                x = self.attentions[j](x, ctx)
        if not self.last:
            x = tF.interpolate(x, scale_factor=2, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class TUNet(tnn.Module):
    """diffusers UNet2DConditionModel semantics, width-parameterized
    (defaults = the tiny test widths; ``test_fullwidth_golden.py`` builds
    the real SD-v1.4 320/640/1280/1280)."""

    def __init__(self, ch=CH, heads=HEADS):
        super().__init__()
        self.ch = ch
        temb = ch[0] * 4
        self.conv_in = tnn.Conv2d(4, ch[0], 3, padding=1)
        self.time_embedding = tnn.Module()
        self.time_embedding.linear_1 = tnn.Linear(ch[0], temb)
        self.time_embedding.linear_2 = tnn.Linear(temb, temb)
        downs, prev = [], ch[0]
        for i, c in enumerate(ch):
            downs.append(TDown(prev, c, temb, attn=i < 3, last=i == 3,
                               heads=heads))
            prev = c
        self.down_blocks = tnn.ModuleList(downs)
        self.mid_block = tnn.Module()
        self.mid_block.resnets = tnn.ModuleList([TResnet(ch[-1], ch[-1], temb),
                                                 TResnet(ch[-1], ch[-1], temb)])
        self.mid_block.attentions = tnn.ModuleList([TTransformer2D(ch[-1], heads)])
        ups = []
        rev = list(reversed(ch))  # e.g. (128, 128, 64, 32)
        # skip channels per up resnet, popped from the down stack
        skip_stack = [ch[0]]
        for i, c in enumerate(ch):
            skip_stack += [c, c]
            if i != 3:
                skip_stack.append(c)
        prev = ch[-1]
        for i, c in enumerate(rev):
            skips = [skip_stack.pop(), skip_stack.pop(), skip_stack.pop()]
            ups.append(TUp(skips, prev, c, temb, attn=i > 0, last=i == 3,
                           heads=heads))
            prev = c
        self.up_blocks = tnn.ModuleList(ups)
        self.conv_norm_out = tnn.GroupNorm(32, ch[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(ch[0], 4, 3, padding=1)

    def forward(self, x, t, ctx, taps=(5, 8, 11)):
        half = self.ch[0] // 2
        freq = torch.exp(-math.log(10000) * torch.arange(half, dtype=torch.float32) / half)
        ang = t.float()[:, None] * freq[None]
        t_emb = torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1)  # flip_sin_to_cos
        temb = self.time_embedding.linear_2(tF.silu(self.time_embedding.linear_1(t_emb)))

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
                if idx in taps:  # 'after' taps (post resnet+attn)
                    feats.append(x)
                idx += 1
            if not blk.last:
                x = tF.interpolate(x, scale_factor=2, mode="nearest")
                x = blk.upsamplers[0].conv(x)
        x = self.conv_out(tF.silu(self.conv_norm_out(x)))
        return x, feats


def test_unet_forward_golden():
    torch.manual_seed(0)
    tu = TUNet().eval()
    x = torch.randn(2, 4, 8, 8)
    t = torch.tensor([0, 37])
    ctx = torch.randn(2, 7, CTX)
    with torch.no_grad():
        ref, ref_feats = tu(x, t, ctx)

    sd = {k: v.numpy() for k, v in tu.state_dict().items()}
    params = convert_unet_state(sd)
    fu = UNet2DCondition(unet_block_indices=(5, 8, 11),
                         unet_block_indices_type="after",
                         block_out_channels=CH)
    eps, feats = jax.jit(
        lambda p, a, tt, c: fu.apply({"params": p}, a, tt, c)
    )(params, to_nhwc(x), jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(from_nhwc(eps), ref.numpy(), atol=3e-4)
    assert len(feats) == len(ref_feats)
    for f, rf in zip(feats, ref_feats):
        np.testing.assert_allclose(from_nhwc(f), rf.numpy(), atol=3e-4)


# --------------------------------------------------------------- torch VAE
class TVaeAttn(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.group_norm = tnn.GroupNorm(32, ch, eps=1e-6)
        self.to_q = tnn.Linear(ch, ch)
        self.to_k = tnn.Linear(ch, ch)
        self.to_v = tnn.Linear(ch, ch)
        setattr(self, "to_out", tnn.ModuleList([tnn.Linear(ch, ch)]))

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        a = torch.softmax(q @ k.transpose(-1, -2) * c ** -0.5, dim=-1)
        y = self.to_out[0](a @ v)
        return y.reshape(b, h, w, c).permute(0, 3, 1, 2) + res


class TMid(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.resnets = tnn.ModuleList([TResnet(ch, ch, None, eps=1e-6),
                                       TResnet(ch, ch, None, eps=1e-6)])
        self.attentions = tnn.ModuleList([TVaeAttn(ch)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class TVaeEncoder(tnn.Module):
    def __init__(self, vch=VCH):
        super().__init__()
        self.conv_in = tnn.Conv2d(3, vch[0], 3, padding=1)
        blocks, prev = [], vch[0]
        for i, c in enumerate(vch):
            b = tnn.Module()
            b.resnets = tnn.ModuleList([TResnet(prev, c, None, eps=1e-6),
                                        TResnet(c, c, None, eps=1e-6)])
            if i != 3:
                b.downsamplers = tnn.ModuleList([tnn.Module()])
                b.downsamplers[0].conv = tnn.Conv2d(c, c, 3, stride=2, padding=0)
            blocks.append(b)
            prev = c
        self.down_blocks = tnn.ModuleList(blocks)
        self.mid_block = TMid(vch[-1])
        self.conv_norm_out = tnn.GroupNorm(32, vch[-1], eps=1e-6)
        self.conv_out = tnn.Conv2d(vch[-1], 8, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for i, b in enumerate(self.down_blocks):
            for r in b.resnets:
                x = r(x)
            if hasattr(b, "downsamplers"):
                x = b.downsamplers[0].conv(tF.pad(x, (0, 1, 0, 1)))
        x = self.mid_block(x)
        return self.conv_out(tF.silu(self.conv_norm_out(x)))


class TVaeDecoder(tnn.Module):
    def __init__(self, vch=VCH):
        super().__init__()
        rev = list(reversed(vch))  # e.g. (64, 64, 32, 32)
        self.conv_in = tnn.Conv2d(4, rev[0], 3, padding=1)
        self.mid_block = TMid(rev[0])
        blocks, prev = [], rev[0]
        for i, c in enumerate(rev):
            b = tnn.Module()
            b.resnets = tnn.ModuleList([TResnet(prev, c, None, eps=1e-6),
                                        TResnet(c, c, None, eps=1e-6),
                                        TResnet(c, c, None, eps=1e-6)])
            if i != 3:
                b.upsamplers = tnn.ModuleList([tnn.Module()])
                b.upsamplers[0].conv = tnn.Conv2d(c, c, 3, padding=1)
            blocks.append(b)
            prev = c
        self.up_blocks = tnn.ModuleList(blocks)
        self.conv_norm_out = tnn.GroupNorm(32, rev[-1], eps=1e-6)
        self.conv_out = tnn.Conv2d(rev[-1], 3, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block(x)
        for b in self.up_blocks:
            for r in b.resnets:
                x = r(x)
            if hasattr(b, "upsamplers"):
                x = b.upsamplers[0].conv(tF.interpolate(x, scale_factor=2, mode="nearest"))
        return self.conv_out(tF.silu(self.conv_norm_out(x)))


def test_vae_encoder_golden():
    torch.manual_seed(1)
    te = TVaeEncoder().eval()
    quant = tnn.Conv2d(8, 8, 1).eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        moments = quant(te(x))
        ref_latent = moments[:, :4] * 0.18215  # posterior mean, deterministic

    sd = {"encoder." + k: v.numpy() for k, v in te.state_dict().items()}
    sd["quant_conv.weight"] = quant.weight.detach().numpy()
    sd["quant_conv.bias"] = quant.bias.detach().numpy()
    enc_params, _ = convert_vae_state(sd)
    fe = FlaxEncoder(block_out_channels=VCH)
    lat, _ = jax.jit(lambda p, a: fe.apply({"params": p}, a))(enc_params, to_nhwc(x))
    np.testing.assert_allclose(from_nhwc(lat), ref_latent.numpy(), atol=2e-4)


def test_vae_decoder_golden():
    torch.manual_seed(2)
    td = TVaeDecoder().eval()
    pq = tnn.Conv2d(4, 4, 1).eval()
    z = torch.randn(1, 4, 8, 8)
    with torch.no_grad():
        ref = td(pq(z / 0.18215))

    sd = {"decoder." + k: v.numpy() for k, v in td.state_dict().items()}
    sd["post_quant_conv.weight"] = pq.weight.detach().numpy()
    sd["post_quant_conv.bias"] = pq.bias.detach().numpy()
    _, dec_params = convert_vae_state(sd)
    fd = FlaxDecoder(block_out_channels=VCH)
    out, _ = jax.jit(lambda p, a: fd.apply({"params": p}, a))(dec_params, to_nhwc(z))
    np.testing.assert_allclose(from_nhwc(out), ref.numpy(), atol=3e-4)
