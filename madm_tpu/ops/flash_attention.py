"""Pallas TPU attention kernel for the SD UNet's 16 attention blocks.

The reference runs diffusers' torch attention, materializing the full
[S, S] score matrix in GPU memory (its xformers flash path is commented out —
``ldm_diffusers.py:257``).  On TPU the dominant cost at the 64x64 latent
(S=4096, D=40) is HBM traffic for those scores (~270 MB/layer in bf16);
this kernel keeps each q-block's scores in VMEM and never writes them out.

Design (sized to MADM's static shapes — S in {64, 256, 1024, 4096} self /
77 cross, D in {40, 80, 160}, 8 heads):

- grid (B, H, n_q_blocks); a q tile [bq, D] against the FULL K/V for that
  (batch, head) — K/V for S<=4096, D<=160 fit comfortably in VMEM, so no
  online-softmax streaming is needed; one fused QK^T -> masked softmax(fp32)
  -> PV per grid step.
- 4D BlockSpecs index straight into [B, S, H, D] — no host-side transpose.
- Cross-attention pads Sk (77 -> 128) in the wrapper; padded keys are
  masked to -inf before the softmax inside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_LOG2E = 1.4426950408889634


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    # VPU economy on the [bq, Sk] score passes (the dominant non-MXU cost
    # at S=4096): scale*log2(e) is folded into q BEFORE the QK dot (an
    # f32 multiply over [bq, D] — Sk/D times cheaper than scaling the
    # scores), the softmax runs in base 2 (exp2(s - m) == softmax of the
    # scaled scores; exp2 also avoids exp's internal x*log2e step), and
    # the normalizer divides the [bq, D] PV output instead of the scores.
    q = q_ref[0, 0, :, :]  # [bq, D]
    k = k_ref[0, 0, :, :]  # [Sk_pad, D]
    v = v_ref[0, 0, :, :]
    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)

    scores = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, Sk_pad] fp32, log2-domain
    sk_pad = k.shape[0]
    if kv_len < sk_pad:  # static: mask the wrapper's padding keys
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < kv_len, scores, -jnp.inf)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp2(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)  # [bq, 1] fp32

    out = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / denom
    o_ref[0, 0, :, :] = out.astype(o_ref.dtype)


def _pick_bq(sq: int, sk_pad: int, d: int, itemsize: int,
             n_score_bufs: int = 2) -> int:
    """Largest q block keeping scores + tiles well under the VMEM budget.

    v5e has 128 MB of VMEM per core: the budgets below admit bq=1024 at
    the UNet's S=4096 shapes (scores 32 MB) — 8x fewer softmax reduce
    passes and a deeper MXU M-dim than the 16 MB-era bq=128 (with the
    exp2 softmax: 4.52 -> 4.18 ms/call chained A/B at B=8 H=8 S=4096
    D=40, ~41 TF/s ≈ the D=40 underfill + softmax-VPU roofline).  K/V
    residency matters for the VAE's single-head D=512 attention, where
    K/V alone are 8.4 MB."""
    total_budget = 96 * 1024 * 1024
    scores_budget = 40 * 1024 * 1024
    kv_bytes = 2 * sk_pad * d * itemsize
    for bq in (1024, 512, 256, 128, 64, 32, 16, 8):
        if bq > sq:
            continue
        if sq % bq:
            continue
        # n_score_bufs [bq, Sk_pad] f32 live at once: 2 in the forward
        # (scores + exp), ~5 in the backward (s, p, dp, ds + slack)
        scores_bytes = bq * sk_pad * 4 * n_score_bufs
        q_bytes = 2 * bq * d * itemsize
        if scores_bytes < scores_budget and (
            kv_bytes + scores_bytes + q_bytes < total_budget
        ):
            return bq
    return min(8, sq)


def flash_attention(
    q: jax.Array,  # [B, Sq, H, D]
    k: jax.Array,  # [B, Sk, H, D]
    v: jax.Array,
    scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable wrapper: Pallas forward, XLA-recompute backward.

    The backward re-derives the attention via the einsum formulation and
    jax.vjp (flash-style recomputation: no scores were saved).  A dedicated
    backward kernel can replace it later without changing the API."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_attention_vjp(q, k, v, scale, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_attention_vjp(q, k, v, scale, interpret):
    return _flash_attention_fwd_impl(q, k, v, scale=scale, interpret=interpret)


def _fa_fwd(q, k, v, scale, interpret):
    out = _flash_attention_fwd_impl(q, k, v, scale=scale, interpret=interpret)
    return out, (q, k, v)


def _fa_bwd(scale, interpret, res, g):
    import os

    q, k, v = res
    if os.environ.get("MADM_FLASH_BWD", "pallas") == "xla":
        # legacy fallback: XLA recompute (materializes the S x S scores)
        from .attention import _xla_attention

        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_attention(q_, k_, v_, scale), q, k, v
        )
        return vjp(g)
    return _flash_attention_bwd_impl(q, k, v, g, scale=scale, interpret=interpret)


_flash_attention_vjp.defvjp(_fa_fwd, _fa_bwd)


# ------------------------------------------------------------- backward
def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                     *, scale: float, kv_len: int):
    """One q-block of the flash backward; dk/dv accumulate across q blocks
    (their output block is revisited — zeroed at qi == 0).

    Softmax vjp without saved outputs or row stats: recompute P from Q/K in
    VMEM, then dS = P * (dP - rowsum(dP * P))."""
    qi = pl.program_id(2)
    q = q_ref[0, 0]  # [bq, D]
    k = k_ref[0, 0]  # [Skp, D]
    v = v_ref[0, 0]
    g = g_ref[0, 0].astype(jnp.float32)  # [bq, D]

    # same VPU economy as the forward: scale*log2(e) folded into q before
    # the dot, base-2 softmax (p is identical; dq/dk below still use the
    # unscaled q and apply `scale` to the [bq, D]-sized results)
    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    s = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    sk_pad = k.shape[0]
    if kv_len < sk_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # [bq, Skp] f32

    dp = jax.lax.dot_general(
        g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, Skp]
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - delta)).astype(q.dtype)  # bf16 for the MXU dots

    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)

    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += (
        jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
    ).astype(dk_ref.dtype)
    dv_ref[0, 0] += jax.lax.dot_general(
        p.astype(q.dtype), g.astype(q.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _flash_attention_bwd_impl(q, k, v, g, scale: float, interpret: bool = False):
    """Pallas flash backward: returns (dq, dk, dv) in the [B, S, H, D]
    layout of the public API.  K/V (and the per-block scores) stay in VMEM —
    the S x S score matrix never reaches HBM, unlike the XLA-recompute VJP."""
    b, sq, h, d = q.shape
    sk = k.shape[1]

    gpack = _pack_group(sq, sk, d)
    if gpack > 1:
        return _packed_bwd_impl(q, k, v, g, scale, gpack, interpret=interpret)

    qT = jnp.transpose(q, (0, 2, 1, 3))
    kT = jnp.transpose(k, (0, 2, 1, 3))
    vT = jnp.transpose(v, (0, 2, 1, 3))
    gT = jnp.transpose(g, (0, 2, 1, 3))
    sk_pad = max(128, -(-sk // 128) * 128)
    if sk_pad != sk:
        pad = [(0, 0), (0, 0), (0, sk_pad - sk), (0, 0)]
        kT = jnp.pad(kT, pad)
        vT = jnp.pad(vT, pad)

    bq = _pick_bq(sq, sk_pad, d, q.dtype.itemsize, n_score_bufs=5)
    grid = (b, h, sq // bq)
    kernel = functools.partial(_attn_bwd_kernel, scale=scale, kv_len=sk)
    qspec = pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, sk_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qspec, kvspec, kvspec, qspec],
        out_specs=[qspec, kvspec, kvspec],
        out_shape=[
            jax.ShapeDtypeStruct(qT.shape, q.dtype),
            jax.ShapeDtypeStruct(kT.shape, jnp.float32),
            jax.ShapeDtypeStruct(vT.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * sq * sk * d,
            bytes_accessed=3 * (q.size + k.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
        interpret=interpret,
    )(qT, kT, vT, gT)
    dq = jnp.transpose(dq, (0, 2, 1, 3))
    dk = jnp.transpose(dk[:, :, :sk], (0, 2, 1, 3)).astype(k.dtype)
    dv = jnp.transpose(dv[:, :, :sk], (0, 2, 1, 3)).astype(v.dtype)
    return dq, dk, dv


# ------------------------------------------------ packed-head backward
def _packed_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                       *, scale, skp, g):
    """Backward twin of ``_packed_attn_kernel``: the score recompute, dP
    and dQ dots all run at G*D lanes.  dK'/dV' are accumulated in the
    packed [G*Skp, G*D] layout — only the diagonal blocks are meaningful
    (the off-diagonal MACs are the price of keeping every slice aligned;
    per useful output the MXU fill matches the unpacked 40-lane dots, so
    dk/dv cost the same while s/dp/dq run ~3x denser)."""
    qi = pl.program_id(2)
    q = q_ref[0, 0]  # [bq, G*D]
    kb = k_ref[0, 0]  # [G*Skp, G*D]
    vb = v_ref[0, 0]
    gg = g_ref[0, 0]  # [bq, G*D]

    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    s = jax.lax.dot_general(
        qs, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, G*Skp]
    dp = jax.lax.dot_general(
        gg, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, G*Skp] — vb is zero off-diagonal, so segments don't mix
    ps, dss = [], []
    for gi in range(g):
        sl = slice(gi * skp, (gi + 1) * skp)
        m = jnp.max(s[:, sl], axis=-1, keepdims=True)
        e = jnp.exp2(s[:, sl] - m)
        p_g = e / jnp.sum(e, axis=-1, keepdims=True)
        dp_g = dp[:, sl]
        delta = jnp.sum(dp_g * p_g, axis=-1, keepdims=True)
        ps.append(p_g.astype(q.dtype))
        dss.append((p_g * (dp_g - delta)).astype(q.dtype))
    p = jnp.concatenate(ps, axis=1)
    ds = jnp.concatenate(dss, axis=1)

    dq = jax.lax.dot_general(
        ds, kb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)

    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += (
        jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
    ).astype(dk_ref.dtype)
    dv_ref[0, 0] += jax.lax.dot_general(
        p, gg, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)


def _packed_bwd_impl(q, k, v, grad, scale: float, g: int,
                     interpret: bool = False):
    """Packed-head flash backward for self-attention shapes (Sq == Sk)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    hp = -(-h // g) * g
    qT = jnp.transpose(q, (0, 2, 1, 3))
    kT = jnp.transpose(k, (0, 2, 1, 3))
    vT = jnp.transpose(v, (0, 2, 1, 3))
    gT = jnp.transpose(grad, (0, 2, 1, 3))
    if hp != h:
        pad = [(0, 0), (0, hp - h), (0, 0), (0, 0)]
        qT, kT, vT, gT = (jnp.pad(t, pad) for t in (qT, kT, vT, gT))
    hg = hp // g

    def pack_q(t):
        return t.reshape(b, hg, g, sq, d).transpose(0, 1, 3, 2, 4).reshape(
            b, hg, sq, g * d)

    def blockdiag(t):
        t5 = t.reshape(b, hg, g, sk, d)
        return jnp.concatenate(
            [jnp.pad(t5[:, :, gi],
                     [(0, 0), (0, 0), (0, 0), (gi * d, (g - 1 - gi) * d)])
             for gi in range(g)], axis=2)

    qp, gp = pack_q(qT), pack_q(gT)
    kp, vp = blockdiag(kT), blockdiag(vT)

    bq = min(256, sq)
    grid = (b, hg, sq // bq)
    kernel = functools.partial(_packed_bwd_kernel, scale=scale, skp=sk, g=g)
    qspec = pl.BlockSpec((1, 1, bq, g * d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, g * sk, g * d),
                          lambda bi, hi, qi: (bi, hi, 0, 0),
                          memory_space=pltpu.VMEM)
    dqp, dkp, dvp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qspec, kvspec, kvspec, qspec],
        out_specs=[qspec, kvspec, kvspec],
        out_shape=[
            jax.ShapeDtypeStruct(qp.shape, q.dtype),
            jax.ShapeDtypeStruct(kp.shape, jnp.float32),
            jax.ShapeDtypeStruct(vp.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(6 + 4 * g) * b * hp * sq * sk * d,
            bytes_accessed=3 * (qp.size + kp.size) * q.dtype.itemsize,
            transcendentals=b * hp * sq * sk,
        ),
        interpret=interpret,
    )(qp, kp, vp, gp)

    def unpack_q(t):
        t5 = t.reshape(b, hg, sq, g, d).transpose(0, 1, 3, 2, 4)
        return t5.reshape(b, hp, sq, d)[:, :h]

    def diag(t):
        t5 = t.reshape(b, hg, g, sk, g * d)
        picks = [t5[:, :, gi, :, gi * d:(gi + 1) * d] for gi in range(g)]
        return jnp.stack(picks, axis=2).reshape(b, hp, sk, d)[:, :h]

    dq = jnp.transpose(unpack_q(dqp), (0, 2, 1, 3))
    dk = jnp.transpose(diag(dkp), (0, 2, 1, 3)).astype(k.dtype)
    dv = jnp.transpose(diag(dvp), (0, 2, 1, 3)).astype(v.dtype)
    return dq, dk, dv


# ------------------------------------------------- packed-head forward
def _packed_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, skp, g):
    """G heads per grid step via block-diagonal K'/V' (built in HBM by the
    wrapper): QK^T contracts over G*D lanes and PV emits G*D columns, so at
    D=40 the MXU runs 120/128 lanes instead of 40/128 on BOTH dots.  All
    in-kernel slices are at multiples of Skp (lane-aligned); the softmax
    normalizer is multiplied into e per segment BEFORE the PV dot so the
    [bq, G*D] output stores whole."""
    q = q_ref[0, 0]  # [bq, G*D]
    kb = k_ref[0, 0]  # [G*Skp, G*D] block-diagonal
    vb = v_ref[0, 0]
    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    scores = jax.lax.dot_general(
        qs, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, G*Skp]; columns [gi*Skp, (gi+1)*Skp) = head gi's scores
    es = []
    for gi in range(g):
        s_g = scores[:, gi * skp:(gi + 1) * skp]
        m = jnp.max(s_g, axis=-1, keepdims=True)
        e_g = jnp.exp2(s_g - m)
        r = 1.0 / jnp.sum(e_g, axis=-1, keepdims=True)
        es.append((e_g * r).astype(q.dtype))
    e = jnp.concatenate(es, axis=1)
    out = jax.lax.dot_general(
        e, vb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _packed_fwd_impl(q, k, v, scale: float, g: int, interpret: bool = False):
    """Forward for self-attention shapes with small D: pack ``g`` heads per
    grid step.  K'/V' block-diagonals are formed by XLA (pad+concat in HBM,
    ~2x K/V bytes — cheap next to the score traffic the packing removes)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    hp = -(-h // g) * g
    qT = jnp.transpose(q, (0, 2, 1, 3))
    kT = jnp.transpose(k, (0, 2, 1, 3))
    vT = jnp.transpose(v, (0, 2, 1, 3))
    if hp != h:
        # pad heads to a multiple of g: zero q -> uniform probs over zero v
        # -> zero output, discarded below
        pad = [(0, 0), (0, hp - h), (0, 0), (0, 0)]
        qT, kT, vT = jnp.pad(qT, pad), jnp.pad(kT, pad), jnp.pad(vT, pad)
    hg = hp // g
    qp = qT.reshape(b, hg, g, sq, d).transpose(0, 1, 3, 2, 4).reshape(b, hg, sq, g * d)
    k5 = kT.reshape(b, hg, g, sk, d)
    v5 = vT.reshape(b, hg, g, sk, d)
    kp = jnp.concatenate(
        [jnp.pad(k5[:, :, gi], [(0, 0), (0, 0), (0, 0), (gi * d, (g - 1 - gi) * d)])
         for gi in range(g)], axis=2)
    vp = jnp.concatenate(
        [jnp.pad(v5[:, :, gi], [(0, 0), (0, 0), (0, 0), (gi * d, (g - 1 - gi) * d)])
         for gi in range(g)], axis=2)

    bq = min(512, sq)
    grid = (b, hg, sq // bq)
    kernel = functools.partial(_packed_attn_kernel, scale=scale, skp=sk, g=g)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, g * d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g * sk, g * d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g * sk, g * d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, g * d), lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hp * sq * sk * d,
            bytes_accessed=(qp.size + kp.size + vp.size + qp.size) * q.dtype.itemsize,
            transcendentals=b * hp * sq * sk,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    out = out.reshape(b, hg, sq, g, d).transpose(0, 1, 3, 2, 4).reshape(b, hp, sq, d)
    return jnp.transpose(out[:, :h], (0, 2, 1, 3))


def _pack_group(sq: int, sk: int, d: int) -> int:
    """Head-group size for the packed forward; 1 = don't pack.

    Only the big self-attention shapes win: D must underfill the 128-lane
    MXU with room for >=2 heads, Sq == Sk (no cross-attention kv padding
    in the packed kernel), and the scores wide enough to be MXU- rather
    than overhead-bound."""
    import os

    mode = os.environ.get("MADM_FLASH_PACK", "0")
    if mode == "0":
        return 1
    if sq != sk or sq < 1024 or sq % 512:
        return 1
    return max(1, min(128 // d, 4))


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _flash_attention_fwd_impl(
    q: jax.Array,  # [B, Sq, H, D]
    k: jax.Array,  # [B, Sk, H, D]
    v: jax.Array,
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    b, sq, h, d = q.shape
    sk = k.shape[1]

    g = _pack_group(sq, sk, d)
    if g > 1:
        return _packed_fwd_impl(q, k, v, scale, g, interpret=interpret)

    # Mosaic needs the last two block dims (8, 128)-aligned or array-equal:
    # run the kernel in [B, H, S, D] layout (XLA fuses the transposes into
    # the surrounding projection matmuls)
    q = jnp.transpose(q, (0, 2, 1, 3))
    k = jnp.transpose(k, (0, 2, 1, 3))
    v = jnp.transpose(v, (0, 2, 1, 3))

    sk_pad = max(128, -(-sk // 128) * 128)
    if sk_pad != sk:
        pad = [(0, 0), (0, 0), (0, sk_pad - sk), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    bq = _pick_bq(sq, sk_pad, d, q.dtype.itemsize)
    grid = (b, h, sq // bq)

    kernel = functools.partial(_attn_kernel, scale=scale, kv_len=sk)
    flops = 4 * b * h * sq * sk * d
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
        interpret=interpret,
    )(q, k, v)
    return jnp.transpose(out, (0, 2, 1, 3))
