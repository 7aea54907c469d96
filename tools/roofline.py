"""Analytic per-module FLOP/byte attribution of the 512x512 eval pass.

Walks the jaxpr of each eval stage (VAE encoder, UNet, VAE decoder,
projections, DAFormer head) counting conv_general_dilated / dot_general
FLOPs exactly and elementwise HBM bytes approximately — no device or
compile needed, so it runs anywhere and is implementation-independent
(the pure-XLA paths are traced: MADM_FUSED_HEAD=0 / xla attention;
FLOPs don't change with the Pallas implementations).

Pairs with tools/profile_eval.py's measured trace attribution to anchor
the roofline note in BASELINE.md: achieved TF/s per module = analytic
FLOPs / measured time, against the v5e ceilings (197 TF/s bf16 MXU,
819 GB/s HBM).

Usage: python tools/roofline.py [--bs 8]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

os.environ.setdefault("MADM_FUSED_HEAD", "0")  # count the pure-XLA graph
os.environ.setdefault("MADM_ATTENTION", "xla")

import jax

jax.config.update("jax_platforms", "cpu")  # tracing only — never needs the TPU

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _size(av) -> int:
    return math.prod(av.shape) if av.shape else 1


def count_jaxpr(jaxpr, counts=None):
    """Sum matmul/conv FLOPs and elementwise output bytes over a jaxpr."""
    if counts is None:
        counts = {"mxu_flops": 0, "ew_bytes": 0, "attn_flops": 0}
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "conv_general_dilated":
            out = eqn.outvars[0].aval
            lhs, rhs = (v.aval for v in eqn.invars)
            dn = eqn.params["dimension_numbers"]
            # input dilation (conv-transpose style): each output position
            # touches only ~k/lhs_dilation NONZERO taps per axis — XLA's
            # dgrad lowering skips the interleaved zeros, so count the
            # effective taps (this is what makes the collapsed nearest-2x
            # upsampler (_DilatedUpConv, k=4, lhs_dilation=2) cost 2x2
            # taps, exactly conv3x3-on-the-upsampled-grid / 4)
            lhs_dil = eqn.params.get("lhs_dilation") or ()
            k_spatial = 1.0
            spatial_rhs = [
                d for d in range(rhs.ndim)
                if d not in (dn.rhs_spec[0], dn.rhs_spec[1])
            ]
            for i, d in enumerate(spatial_rhs):
                k = rhs.shape[d]
                dil = lhs_dil[i] if i < len(lhs_dil) else 1
                k_spatial *= max(1.0, k / max(dil, 1))
            cin = rhs.shape[dn.rhs_spec[1]]  # per-group input channels
            counts["mxu_flops"] += int(2 * _size(out) * cin * k_spatial)
        elif prim == "dot_general":
            lhs, rhs = (v.aval for v in eqn.invars[:2])
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            batch = math.prod(lhs.shape[d] for d in lb)
            m = math.prod(
                lhs.shape[d] for d in range(lhs.ndim) if d not in (*lc, *lb)
            )
            n = math.prod(
                rhs.shape[d] for d in range(rhs.ndim) if d not in (*rc, *rb)
            )
            k = math.prod(lhs.shape[d] for d in lc)
            counts["mxu_flops"] += 2 * batch * m * n * k
        elif prim in ("closed_call", "pjit", "custom_jvp_call",
                      "custom_vjp_call", "custom_vjp_call_jaxpr",
                      "remat", "checkpoint"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if inner is not None:
                count_jaxpr(getattr(inner, "jaxpr", inner), counts)
        elif prim in ("scan", "while", "cond"):
            for key in ("jaxpr", "cond_jaxpr", "body_jaxpr", "branches"):
                inner = eqn.params.get(key)
                if inner is None:
                    continue
                for j in (inner if isinstance(inner, (list, tuple)) else [inner]):
                    count_jaxpr(getattr(j, "jaxpr", j), counts)
        else:
            # elementwise / reduce / reshape etc: one write of the output
            # (reads roughly mirror writes; this is the bandwidth proxy)
            for ov in eqn.outvars:
                av = getattr(ov, "aval", None)
                if av is not None and hasattr(av, "shape"):
                    counts["ew_bytes"] += _size(av) * av.dtype.itemsize
    return counts


def stage_counts(fn, *args):
    jaxpr = jax.make_jaxpr(fn)(*args)
    return count_jaxpr(jaxpr.jaxpr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    args = ap.parse_args()

    from madm_tpu.models.madm import MADM, MADMConfig

    model = MADM(MADMConfig())
    variables = jax.eval_shape(
        lambda k: model.init_params(k), jax.random.PRNGKey(0)
    )
    # concretize: zeros with the right shapes (tracing only, never executed)
    variables = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), variables)
    b = args.bs
    images = jnp.zeros((b, 512, 512, 3), jnp.float32)

    # intermediate shapes via eval_shape on the backbone
    bb = lambda v, im: model.backbone_forward(
        v, im, input_modal="others",
        modality_mask=model.modality_mask(im, model.cfg.target_modality),
    )
    bb_shapes = jax.eval_shape(bb, variables, images)
    latents = jnp.zeros((b, 64, 64, 4), jnp.float32)
    taps = [jnp.zeros(a.shape, a.dtype) for a in bb_shapes["unet_taps"]]
    feats = {
        k: jnp.zeros(a.shape, a.dtype)
        for k, a in bb_shapes["output_features"].items()
    }

    stages = {}
    stages["vae_encoder"] = stage_counts(
        lambda v, x: model.vae_encoder.apply(
            {"params": v["params"]["vae_encoder"]}, x
        ),
        variables, images,
    )
    def unet_fn(v, lat):
        t = jnp.zeros((b,), jnp.int32)
        prompt, cond_time = model.conditioning(
            v, "others", False, batch_size=b
        )
        return model.unet.apply({"params": v["params"]["unet"]}, lat, t,
                                prompt, cond_time)
    stages["unet"] = stage_counts(unet_fn, variables, latents)
    stages["vae_decoder"] = stage_counts(
        lambda v, lat: model.vae_decoder.apply(
            {"params": v["params"]["vae_decoder"]}, lat
        ),
        variables, latents,
    )
    dec_rgb = jnp.zeros((b, 512, 512, 3), jnp.float32)
    stages["projections"] = stage_counts(
        lambda v, fs: model.projections.apply(
            {"params": v["params"]["projections"]}, fs
        ),
        variables, [dec_rgb] + list(reversed(taps)),
    )
    stages["head"] = stage_counts(
        lambda v, fs: model.head_forward(v, fs, use_sec_modal=True),
        variables, feats,
    )

    total_f = total_b = 0
    print(f"# analytic eval-pass attribution, bs={b} (per ITERATION)")
    print(f"{'module':14s} {'MXU TFLOP':>10s} {'~EW GB':>8s} "
          f"{'ms @197TF/s':>12s} {'ms @819GB/s':>12s}")
    for name, c in stages.items():
        f, ew = c["mxu_flops"], c["ew_bytes"]
        total_f += f
        total_b += ew
        print(f"{name:14s} {f / 1e12:10.3f} {ew / 1e9:8.2f} "
              f"{f / 197e9:12.2f} {ew / 819e6:12.2f}")
    print(f"{'TOTAL':14s} {total_f / 1e12:10.3f} {total_b / 1e9:8.2f} "
          f"{total_f / 197e9:12.2f} {total_b / 819e6:12.2f}")
    print(f"\n# per-crop: {total_f / b / 1e12:.3f} TFLOP; "
          f"MXU-floor throughput at 197 TF/s = "
          f"{197e12 / (total_f / b):.1f} crops/s/chip")


if __name__ == "__main__":
    main()
