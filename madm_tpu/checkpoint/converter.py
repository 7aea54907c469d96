"""torch checkpoint -> JAX pytree converters.

Covers the two checkpoint families the reference consumes (SURVEY.md §7):

(a) HuggingFace SD-v1.4 snapshots (diffusers ``AutoencoderKL`` /
    ``UNet2DConditionModel`` state dicts, .bin or .safetensors) -> the frozen
    VAE + init UNet weights (``ldm_diffusers.py:246-266``).
(b) Released MADM ``.pth`` files -> trainable subset + EMA copies
    (``checkpoint/odise_checkpointer.py:45-102``: frozen SD/CLIP weights are
    *excluded* from checkpoints and re-materialized from the snapshot; the
    converter reproduces that reconciliation).

Layout transforms (torch NCHW/OI -> flax NHWC/IO):
    conv weight [O,I,kh,kw] -> kernel [kh,kw,I,O]   (also depthwise: I=1)
    linear weight [O,I]     -> kernel [I,O]
    norm weight/bias        -> scale/bias
    1x1-conv proj_in/out    -> dense kernel (we run them as Dense on tokens)

No torch import is required to *read* files: ``.safetensors`` is parsed
directly; ``.bin``/``.pth`` fall back to ``torch.load`` (torch-cpu is
available in this image).
"""

from __future__ import annotations

import json
import os
import re
import struct
from typing import Any, Dict, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------- file I/O

_SAFETENSORS_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
    # BF16 handled specially below
}


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Minimal .safetensors reader (8-byte LE header length + JSON + data)."""
    out = {}
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        data = f.read()
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        start, stop = meta["data_offsets"]
        raw = data[start:stop]
        if meta["dtype"] == "BF16":
            u16 = np.frombuffer(raw, np.uint16).astype(np.uint32) << 16
            arr = u16.view(np.float32) if u16.flags.c_contiguous else u16.copy().view(np.float32)
            arr = arr.astype(np.float32)
        else:
            arr = np.frombuffer(raw, _SAFETENSORS_DTYPES[meta["dtype"]])
        out[name] = arr.reshape(meta["shape"])
    return out


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a torch state dict (.safetensors / .bin / .pth) as numpy."""
    if path.endswith(".safetensors"):
        return load_safetensors(path)
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    return {
        k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
        for k, v in obj.items()
        if hasattr(v, "shape")
    }


# ------------------------------------------------------------- name engine

def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    if path[-1] in node:
        raise ValueError(f"duplicate parameter at {'/'.join(path)}")
    node[path[-1]] = value


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _dense(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w))


def _conv1x1_to_dense(w: np.ndarray) -> np.ndarray:
    return _dense(w[:, :, 0, 0])


_NORM_HINTS = ("norm", "bn", "group_norm", "layer_norm")


def _leaf(torch_leaf: str, parent: str, w: np.ndarray):
    """(flax leaf name, converted tensor)."""
    is_norm = any(h in parent for h in _NORM_HINTS)
    if torch_leaf == "weight":
        if w.ndim == 4:
            return "kernel", _conv(w)
        if w.ndim == 2:
            return "kernel", _dense(w)
        return ("scale", w) if is_norm or w.ndim == 1 else ("kernel", w)
    if torch_leaf == "bias":
        return "bias", w
    if torch_leaf == "running_mean":
        return "mean", w
    if torch_leaf == "running_var":
        return "var", w
    return torch_leaf, w


def _merge_indices(tokens):
    """['down_blocks','0','resnets','1'] -> ['down_blocks_0','resnets_1']."""
    out = []
    for t in tokens:
        if re.fullmatch(r"\d+", t) and out:
            out[-1] = f"{out[-1]}_{t}"
        else:
            out.append(t)
    return out


def _diffusers_rename(key: str) -> str:
    key = key.replace(".ff.net.0.proj.", ".ff.net_0_proj.")
    key = key.replace(".ff.net.2.", ".ff.net_2.")
    key = key.replace(".to_out.0.", ".to_out_0.")
    # legacy VAE attention naming -> modern
    key = key.replace(".query.", ".to_q.").replace(".key.", ".to_k.")
    key = key.replace(".value.", ".to_v.").replace(".proj_attn.", ".to_out_0.")
    return key


# ----------------------------------------------------------------- UNet

def convert_unet_state(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """diffusers UNet2DConditionModel state dict -> flax UNet params."""
    tree: Dict[str, Any] = {}
    for key, w in sd.items():
        key = _diffusers_rename(key)
        tokens = _merge_indices(key.split("."))
        *parents, leaf = tokens
        parent = parents[-1] if parents else ""
        # Transformer2D proj_in/proj_out are 1x1 convs in SD-v1.x; we run
        # them as Dense over tokens
        if parent in ("proj_in", "proj_out") and w.ndim == 4:
            name, val = leaf, _conv1x1_to_dense(w) if leaf == "weight" else w
            name = "kernel" if leaf == "weight" else "bias"
        else:
            name, val = _leaf(leaf, parent, w)
        _set(tree, tuple(parents) + (name,), val)
    return tree


# ----------------------------------------------------------------- VAE

def convert_vae_state(
    sd: Dict[str, np.ndarray],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """diffusers AutoencoderKL state dict -> (encoder params, decoder params).

    Our Encoder flattens diffusers' ``encoder.down_blocks.N.resnets.M`` into a
    single ``down_blocks_N_resnets_M`` module and owns ``quant_conv``;
    Decoder likewise owns ``post_quant_conv``.
    """
    enc: Dict[str, Any] = {}
    dec: Dict[str, Any] = {}
    for key, w in sd.items():
        key = _diffusers_rename(key)
        if key.startswith("encoder."):
            dest, rel = enc, key[len("encoder."):]
        elif key.startswith("decoder."):
            dest, rel = dec, key[len("decoder."):]
        elif key.startswith("quant_conv."):
            dest, rel = enc, key
        elif key.startswith("post_quant_conv."):
            dest, rel = dec, key
        else:
            continue
        tokens = _merge_indices(rel.split("."))
        *parents, leaf = tokens
        # flatten block containers: down_blocks_N resnets_M -> one name;
        # mid_block keeps its sub-structure
        if parents and parents[0].startswith(("down_blocks_", "up_blocks_")):
            parents = ["_".join(parents[:2])] + parents[2:]
        parent = parents[-1] if parents else ""
        name, val = _leaf(leaf, parent, w)
        _set(dest, tuple(parents) + (name,), val)
    return enc, dec


def convert_clip_text_state(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """HF CLIPTextModel state dict -> flax CLIPTextTransformer params.

    Handles both bare keys and the ``text_model.`` prefix; the NeTI wrapper
    class in the reference keeps HF naming underneath
    (``modeling/neti/neti_clip_text_encoder.py``)."""
    tree: Dict[str, Any] = {}
    for key, w in sd.items():
        key = key.removeprefix("text_model.")
        if key.startswith("embeddings.token_embedding."):
            _set(tree, ("token_embedding", "embedding"), w)
            continue
        if key.startswith("embeddings.position_embedding."):
            _set(tree, ("position_embedding",), w)
            continue
        if key.startswith("embeddings.position_ids"):
            continue
        if key.startswith("encoder.layers."):
            rest = key[len("encoder.layers."):]
            idx, rest = rest.split(".", 1)
            rest = rest.replace("mlp.fc1", "mlp_fc1").replace("mlp.fc2", "mlp_fc2")
            tokens = rest.split(".")
            *parents, leaf = tokens
            name, val = _leaf(leaf, parents[-1] if parents else "", w)
            _set(tree, (f"layers_{idx}",) + tuple(parents) + (name,), val)
            continue
        if key.startswith("final_layer_norm."):
            leaf = key.split(".")[-1]
            name, val = _leaf(leaf, "final_layer_norm", w)
            _set(tree, ("final_layer_norm", name), val)
            continue
        # NeTI mapper keys or pooler heads: ignored here (mapper converted
        # separately when present)
    return tree


def convert_clip_vision_state(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """HF CLIPVisionModel(WithProjection) state dict -> flax
    CLIPVisionTransformer params (note HF's 'pre_layrnorm' typo)."""
    tree: Dict[str, Any] = {}
    for key, w in sd.items():
        key = key.removeprefix("vision_model.")
        if key == "visual_projection.weight":
            _set(tree, ("visual_projection", "kernel"), _dense(w))
            continue
        if key.startswith("embeddings.class_embedding"):
            _set(tree, ("class_embedding",), w.reshape(-1))
            continue
        if key.startswith("embeddings.patch_embedding."):
            _set(tree, ("patch_embedding", "kernel"), _conv(w))
            continue
        if key.startswith("embeddings.position_embedding."):
            _set(tree, ("position_embedding",), w)
            continue
        if key.startswith("embeddings.position_ids"):
            continue
        if key.startswith(("pre_layrnorm.", "pre_layernorm.")):
            leaf = key.split(".")[-1]
            name, val = _leaf(leaf, "norm", w)
            _set(tree, ("pre_layernorm", name), val)
            continue
        if key.startswith("post_layernorm."):
            leaf = key.split(".")[-1]
            name, val = _leaf(leaf, "norm", w)
            _set(tree, ("post_layernorm", name), val)
            continue
        if key.startswith("encoder.layers."):
            rest = key[len("encoder.layers."):]
            idx, rest = rest.split(".", 1)
            rest = rest.replace("mlp.fc1", "mlp_fc1").replace("mlp.fc2", "mlp_fc2")
            tokens = rest.split(".")
            *parents, leaf = tokens
            name, val = _leaf(leaf, parents[-1] if parents else "", w)
            _set(tree, (f"layers_{idx}",) + tuple(parents) + (name,), val)
            continue
    return tree


def load_sd_snapshot(snapshot_dir: str):
    """Load VAE + UNet from a HF SD-v1.4 snapshot directory.

    Returns {'vae_encoder', 'vae_decoder', 'unet'} flax param trees.
    (reference loads the same snapshot via from_pretrained —
    ``ldm_diffusers.py:246-266``.)"""
    def find(sub, names):
        d = os.path.join(os.path.expanduser(snapshot_dir), sub)
        for name in names:
            p = os.path.join(d, name)
            if os.path.exists(p):
                return p
        raise FileNotFoundError(f"no weights under {d}")

    diff_names = ("diffusion_pytorch_model.safetensors", "diffusion_pytorch_model.bin")
    vae_sd = load_torch_file(find("vae", diff_names))
    unet_sd = load_torch_file(find("unet", diff_names))
    enc, dec = convert_vae_state(vae_sd)
    out = {
        "vae_encoder": enc,
        "vae_decoder": dec,
        "unet": convert_unet_state(unet_sd),
    }
    try:
        text_sd = load_torch_file(
            find("text_encoder", ("model.safetensors", "pytorch_model.bin"))
        )
        out["clip_text"] = convert_clip_text_state(text_sd)
    except FileNotFoundError:
        pass  # text encoder optional: only needed to recompute uncond_inputs
    return out


# ------------------------------------------------------------- MADM .pth

_PROJ_LEAF_MAP = {
    # d2 BottleneckBlock: convN(.norm) -> convN / normN; shortcut(.norm)
    "conv1": ("conv1",), "conv2": ("conv2",), "conv3": ("conv3",),
    "shortcut": ("shortcut",),
}


def _convert_bottleneck(sub: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """d2 BottleneckBlock state dict (relative keys) -> our BottleneckBlock."""
    out: Dict[str, Any] = {}
    for key, w in sub.items():
        tokens = key.split(".")
        conv, rest = tokens[0], tokens[1:]
        if rest and rest[0] == "norm":
            dest = "shortcut_norm" if conv == "shortcut" else conv.replace("conv", "norm")
            name, val = _leaf(rest[1], "norm", w)
        else:
            dest = conv
            name, val = _leaf(rest[0] if rest else "weight", conv, w)
        _set(out, (dest, name), val)
    return out


def convert_projections(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    """``backbone.feature_projections.N.B...`` -> MultiScaleProjection params."""
    out: Dict[str, Any] = {}
    groups: Dict[Tuple[int, int], Dict[str, np.ndarray]] = {}
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.(\d+)\.(.+)")
    for key, w in sd.items():
        m = pat.match(key)
        if m:
            idx, blk, rel = int(m.group(1)), int(m.group(2)), m.group(3)
            groups.setdefault((idx, blk), {})[rel] = w
    for (idx, blk), sub in groups.items():
        out[f"proj_{idx}_block_{blk}"] = _convert_bottleneck(sub)
    return out


def convert_daformer_head(
    sd: Dict[str, np.ndarray], prefix: str, in_index=(0, 1, 2, 3)
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """reference DAFormerHead state dict -> (params, batch_stats)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    vae_proj: Dict[str, np.ndarray] = {}

    def put(rel_key: str, w: np.ndarray):
        if rel_key.endswith("num_batches_tracked"):
            return  # torch BN bookkeeping; no flax equivalent
        if rel_key.startswith("vae_decoder_feat_proj."):
            # final_fuse_vae_decoder_feat projection: a 1-block d2
            # BottleneckBlock Sequential (daformer_head.py:575-589)
            vae_proj[rel_key.split(".", 2)[2]] = w  # drop Sequential '0.'
            return
        tokens = _merge_indices(rel_key.split("."))
        # embed_layers.{i}.proj -> embed_{pos}
        if tokens[0].startswith("embed_layers_"):
            i = int(tokens[0].split("_")[-1])
            pos = list(in_index).index(i)
            name, val = _leaf(tokens[-1], "dense", w)
            _set(params, (f"embed_{pos}", name), val)
            return
        if tokens[0] == "conv_seg":
            name, val = _leaf(tokens[-1], "conv", w)
            _set(params, ("conv_seg", name), val)
            return
        if tokens[0] == "fuse_layer":
            rest = tokens[1:]
            if rest[0].startswith("aspp_modules_"):
                i = rest[0].split("_")[-1]
                rest = [f"aspp_{i}"] + rest[1:]
            # drop the mmcv ConvModule '.conv' level only where our module
            # keeps it too (we keep 'conv'/'bn' names) — structure matches
            leaf = rest[-1]
            parent = rest[-2] if len(rest) > 1 else ""
            name, val = _leaf(leaf, parent, w)
            dest = stats if name in ("mean", "var") else params
            _set(dest, ("fuse_layer",) + tuple(rest[:-1]) + (name,), val)
            return
        raise KeyError(f"unhandled head key {rel_key}")

    plen = len(prefix) + 1
    for key, w in sd.items():
        if key.startswith(prefix + "."):
            put(key[plen:], w)
    if vae_proj:
        params["vae_decoder_feat_proj"] = _convert_bottleneck(vae_proj)
    return params, stats


def convert_clip_project(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    """ClipFeatureProject tensors (prompt/time embeds + alphas) -> pytree."""
    out = {}
    plen = len(prefix) + 1
    for key, w in sd.items():
        if key.startswith(prefix + "."):
            out[key[plen:]] = w
    return out


def _convert_peft_unet_key(key: str) -> Tuple[str, Optional[str]]:
    """Strip peft wrappers: ``...to_q.base_layer.weight`` -> base key;
    ``...to_q.lora_A.<adapter>.weight`` -> (base key, adapter)."""
    m = re.match(r"(.*)\.lora_(A|B)\.([^.]+)\.weight$", key)
    if m:
        return f"{m.group(1)}.lora_{m.group(2)}", m.group(3)
    return key.replace(".base_layer.", "."), None


def convert_madm_pth(
    path_or_sd,
    in_index=(0, 1, 2, 3),
) -> Dict[str, Any]:
    """Released MADM checkpoint -> partial variables tree.

    Returns {'params': {unet?, lora?, prompt, projections, head},
             'ema': {projections, head, clip_project_others},
             'state': {head_bn, ema_head_bn}} — everything present in the
    file; frozen VAE comes from the SD snapshot (odise_checkpointer.py:78-101
    ignored-keys contract)."""
    sd = path_or_sd if isinstance(path_or_sd, dict) else load_torch_file(path_or_sd)

    def split_unet(prefix: str):
        """peft-wrapped UNet keys under ``prefix`` -> (unet tree?, lora trees?)."""
        unet_sd: Dict[str, np.ndarray] = {}
        lora_raw: Dict[str, Dict[str, np.ndarray]] = {}
        for key, w in sd.items():
            if key.startswith(prefix):
                rel, adapter = _convert_peft_unet_key(key[len(prefix):])
                if adapter is None:
                    unet_sd[rel] = w
                else:
                    lora_raw.setdefault(adapter, {})[rel] = w
        loras: Dict[str, Any] = {}
        for adapter, tensors in lora_raw.items():
            tree: Dict[str, Any] = {}
            for key, w in tensors.items():
                key = _diffusers_rename(key)
                tokens = _merge_indices(key.split("."))
                *parents, ab = tokens
                if ab == "lora_A":  # torch [r, in] -> a [in, r]
                    _set(tree, tuple(parents) + ("lora_a",), _dense(w))
                else:  # lora_B torch [out, r] -> b [r, out]
                    _set(tree, tuple(parents) + ("lora_b",), _dense(w))
            loras[adapter] = tree
        unet = convert_unet_state(unet_sd) if unet_sd else None
        return unet, loras or None

    out: Dict[str, Any] = {"params": {}, "ema": {}, "state": {}}
    unet, loras = split_unet("backbone.feature_extractor.ldm_extractor.unet.")
    if unet:
        out["params"]["unet"] = unet
    if loras:
        out["params"]["lora"] = loras
    # --ema_w_unet checkpoints also carry the teacher's UNet+LoRA deepcopy
    # (cmdise.py:318-321)
    ema_unet, ema_loras = split_unet(
        "backbone.feature_extractor.ldm_extractor.ema_unet."
    )
    if ema_unet:
        out["ema"]["unet"] = ema_unet
    if ema_loras:
        out["ema"]["lora"] = ema_loras

    proj = convert_projections(sd, "backbone.feature_projections")
    if proj:
        out["params"]["projections"] = proj
    ema_proj = convert_projections(sd, "backbone.ema_feature_projections")
    if ema_proj:
        out["ema"]["projections"] = ema_proj

    head, head_bn = convert_daformer_head(sd, "sem_seg_head", in_index)
    if head:
        out["params"]["head"] = head
        out["state"]["head_bn"] = head_bn
    ema_head, ema_head_bn = convert_daformer_head(sd, "ema_sem_seg_head", in_index)
    if ema_head:
        out["ema"]["head"] = ema_head
        out["state"]["ema_head_bn"] = ema_head_bn

    rgb = convert_clip_project(sd, "backbone.feature_extractor.clip_project_rgb")
    if rgb:
        out["params"]["prompt"] = {"clip_project_rgb": rgb}
    others = convert_clip_project(
        sd, "backbone.feature_extractor.clip_project_others"
    )
    if others:
        out["params"].setdefault("prompt", {})["clip_project_others"] = others
    ema_others = convert_clip_project(
        sd, "backbone.feature_extractor.ema_clip_project_others"
    )
    if ema_others:
        out["ema"]["clip_project_others"] = ema_others
    return out


def merge_into_variables(variables: Dict[str, Any], converted: Dict[str, Any]):
    """Overlay a (partial) converted tree onto model variables, checking
    shapes; returns the merged tree (missing keys keep current values —
    the ``_load_model`` reconciliation of ``odise_checkpointer.py:45-102``)."""
    import jax.numpy as jnp

    def overlay(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                out[k] = overlay(dst[k], v, f"{path}/{k}")
            else:
                if k in dst and hasattr(dst[k], "shape") and hasattr(v, "shape"):
                    if tuple(dst[k].shape) != tuple(v.shape):
                        raise ValueError(
                            f"shape mismatch at {path}/{k}: "
                            f"{tuple(dst[k].shape)} vs {tuple(v.shape)}"
                        )
                    v = jnp.asarray(v, dtype=dst[k].dtype)
                out[k] = v
        return out

    return overlay(variables, converted)


def expand_conv_in(
    kernel: np.ndarray,
    input_channel_plus: int = 0,
    concat_pixel_shuffle: bool = False,
) -> np.ndarray:
    """Widen a 4-channel SD conv_in kernel for the conv_in-surgery ablations
    (reference ``ldm_diffusers.py:60-99``).  ``kernel``: flax [kh,kw,4,out].

    - ``input_channel_plus=N``: scale by ``4./4 + N`` (the reference's
      literal expression — operator precedence makes it ``1+N``, kept
      faithfully), copy into the first 4 channels and tile the last N
      channels of the scaled weights into the new slots.
    - ``concat_pixel_shuffle``: 17 copies of the kernel / 17 (68 inputs).
    """
    assert kernel.shape[2] == 4, kernel.shape
    if input_channel_plus:
        w = kernel * (4.0 / 4 + input_channel_plus)
        return np.concatenate([w, w[:, :, -input_channel_plus:, :]], axis=2)
    if concat_pixel_shuffle:
        w = kernel / 17.0
        return np.concatenate([w] * 17, axis=2)
    return kernel


# --------------------------------------------------- CompVis .ckpt support
# (the legacy LdmCheckpointer contract, odise_checkpointer.py:114-124: raw
# SD checkpoints store a 'state_dict' with model.diffusion_model /
# first_stage_model / cond_stage_model prefixes.  We rename CompVis keys to
# diffusers layout and reuse the diffusers->flax converters above.)

def _compvis_unet_key(key: str) -> Optional[str]:
    """'model.diffusion_model.X' (prefix stripped) -> diffusers UNet key."""
    if key.startswith("time_embed."):
        return key.replace("time_embed.0.", "time_embedding.linear_1.").replace(
            "time_embed.2.", "time_embedding.linear_2."
        )
    if key.startswith("input_blocks.0.0."):
        return key.replace("input_blocks.0.0.", "conv_in.")
    if key.startswith("out.0."):
        return key.replace("out.0.", "conv_norm_out.")
    if key.startswith("out.2."):
        return key.replace("out.2.", "conv_out.")

    def resnet(rest: str) -> str:
        return (
            rest.replace("in_layers.0.", "norm1.")
            .replace("in_layers.2.", "conv1.")
            .replace("emb_layers.1.", "time_emb_proj.")
            .replace("out_layers.0.", "norm2.")
            .replace("out_layers.3.", "conv2.")
            .replace("skip_connection.", "conv_shortcut.")
        )

    if key.startswith("input_blocks."):
        _, n, m, rest = key.split(".", 3)
        n, m = int(n), int(m)
        i, j = (n - 1) // 3, (n - 1) % 3
        if j == 2:  # downsample block: 'op' conv
            assert m == 0, key
            return f"down_blocks.{i}.downsamplers.0.conv.{rest.removeprefix('op.')}"
        if m == 0:
            return f"down_blocks.{i}.resnets.{j}.{resnet(rest)}"
        return f"down_blocks.{i}.attentions.{j}.{rest}"
    if key.startswith("middle_block."):
        _, m, rest = key.split(".", 2)
        m = int(m)
        if m == 0:
            return f"mid_block.resnets.0.{resnet(rest)}"
        if m == 1:
            return f"mid_block.attentions.0.{rest}"
        return f"mid_block.resnets.1.{resnet(rest)}"
    if key.startswith("output_blocks."):
        _, n, m, rest = key.split(".", 3)
        n, m = int(n), int(m)
        i, j = n // 3, n % 3
        if m == 0:
            return f"up_blocks.{i}.resnets.{j}.{resnet(rest)}"
        # module slot 1 is the attention except in the no-attention level
        # (up block 0), where it is the upsampler; slot 2 is always upsampler
        if rest.startswith("conv.") and (m == 2 or i == 0):
            return f"up_blocks.{i}.upsamplers.0.{rest}"
        return f"up_blocks.{i}.attentions.{j}.{rest}"
    return None  # label_emb or other unused heads


def _compvis_vae_key(key: str) -> Optional[str]:
    """'first_stage_model.X' (prefix stripped) -> diffusers AutoencoderKL key.

    CompVis VAE attention q/k/v/proj_out are 1x1 convs; the caller squeezes
    them to linear (the diffusers conversion does the same reshape)."""
    def resnet(rest: str) -> str:
        return rest.replace("nin_shortcut.", "conv_shortcut.")

    def attn(rest: str) -> str:
        return (
            rest.replace("norm.", "group_norm.")
            .replace("q.", "to_q.").replace("k.", "to_k.")
            .replace("v.", "to_v.").replace("proj_out.", "to_out.0.")
        )

    for side in ("encoder", "decoder"):
        p = side + "."
        if not key.startswith(p):
            continue
        rest = key[len(p):]
        if rest.startswith(("conv_in.", "conv_out.")):
            return key
        if rest.startswith("norm_out."):
            return p + rest.replace("norm_out.", "conv_norm_out.")
        if rest.startswith("mid."):
            sub = rest[len("mid."):]
            if sub.startswith("block_1."):
                return p + "mid_block.resnets.0." + resnet(sub[len("block_1."):])
            if sub.startswith("block_2."):
                return p + "mid_block.resnets.1." + resnet(sub[len("block_2."):])
            assert sub.startswith("attn_1."), key
            return p + "mid_block.attentions.0." + attn(sub[len("attn_1."):])
        if side == "encoder" and rest.startswith("down."):
            _, lvl, kind, remainder = rest.split(".", 3)
            if kind == "block":
                j, r2 = remainder.split(".", 1)
                return f"encoder.down_blocks.{lvl}.resnets.{j}.{resnet(r2)}"
            assert kind == "downsample", key
            return f"encoder.down_blocks.{lvl}.downsamplers.0.{remainder}"
        if side == "decoder" and rest.startswith("up."):
            _, lvl, kind, remainder = rest.split(".", 3)
            # CompVis indexes decoder levels 0 = highest resolution;
            # diffusers up_blocks run lowest-res first
            i = 3 - int(lvl)
            if kind == "block":
                j, r2 = remainder.split(".", 1)
                return f"decoder.up_blocks.{i}.resnets.{j}.{resnet(r2)}"
            assert kind == "upsample", key
            return f"decoder.up_blocks.{i}.upsamplers.0.{remainder}"
    if key.startswith(("quant_conv.", "post_quant_conv.")):
        return key
    return None


def convert_compvis_state(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """CompVis SD checkpoint state_dict -> flax trees
    {'unet', 'vae_encoder', 'vae_decoder', 'clip_text'}."""
    unet_sd, vae_sd, clip_sd = {}, {}, {}
    for key, w in sd.items():
        if key.startswith("model.diffusion_model."):
            nk = _compvis_unet_key(key[len("model.diffusion_model."):])
            if nk is not None:
                unet_sd[nk] = w
        elif key.startswith("first_stage_model."):
            nk = _compvis_vae_key(key[len("first_stage_model."):])
            if nk is not None:
                if ".attentions.0.to_" in nk and w.ndim == 4:
                    w = w.reshape(w.shape[0], w.shape[1])  # 1x1 conv -> linear
                vae_sd[nk] = w
        elif key.startswith("cond_stage_model.transformer."):
            clip_sd[key[len("cond_stage_model.transformer."):]] = w
    out: Dict[str, Any] = {}
    if unet_sd:
        out["unet"] = convert_unet_state(unet_sd)
    if vae_sd:
        enc, dec = convert_vae_state(vae_sd)
        out["vae_encoder"], out["vae_decoder"] = enc, dec
    if clip_sd:
        out["clip_text"] = convert_clip_text_state(clip_sd)
    return out


def load_compvis_checkpoint(path: str) -> Dict[str, Any]:
    """Load a raw CompVis ``sd-v1-*.ckpt`` (the LdmCheckpointer contract —
    ``odise_checkpointer.py:114-124``: the file stores {'state_dict': ...})."""
    sd = load_torch_file(path)
    if "state_dict" in sd and not hasattr(sd["state_dict"], "shape"):
        sd = sd["state_dict"]
    return convert_compvis_state(sd)


class LdmCheckpointer:
    """Name-parity shim for the reference's ``LdmCheckpointer``
    (``checkpoint/odise_checkpointer.py:114-124``): ``load(path)`` returns
    the converted flax trees for a raw SD checkpoint."""

    def __init__(self, model=None):
        self.model = model

    def load(self, path: str) -> Dict[str, Any]:
        return load_compvis_checkpoint(path)
