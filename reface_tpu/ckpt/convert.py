"""PyTorch state_dict -> reface_tpu flax param-tree converters.

Covers the reference's five heterogeneous checkpoints
(SURVEY.md "hard parts" #2):
  - REFace/SD `last.ckpt` layout:  model.diffusion_model.* (UNet),
    first_stage_model.* (VAE), cond_stage_model.* (CLIP+mapper),
    proj_out_source/target, ID_proj_out, landmark_proj_out, learnable_vector
    (ldm/models/diffusion/ddpm.py:698-733)
  - HF CLIPModel (openai/clip-vit-large-patch14) vision tower
  - ArcFace model_ir_se50.pth (src/Face_models/encoders/model_irse.py)

Strategy: walk OUR param tree (authoritative, from module init/eval_shape),
derive each leaf's torch key + layout transform from its flax path, and fail
loudly on anything missing/mismatched — conversion completeness is checked
structurally, activation parity per-layer in tests/test_convert.py.

Layout rules (torch -> flax):
  Linear  weight (O,I)        -> kernel (I,O)          [transpose]
  Conv2d  weight (O,I,kh,kw)  -> kernel (kh,kw,I,O)    [transpose 2,3,1,0]
  Norms   weight/bias         -> scale/bias
  BatchNorm running stats     -> BatchNormInference mean/var params
  NCHW-flatten Linear         -> kernel rows permuted to NHWC-flatten order
"""

from __future__ import annotations

import re
from typing import Any, Callable, Mapping

import numpy as np

__all__ = [
    "convert_unet",
    "convert_vae",
    "convert_clip_conditioner",
    "convert_arcface",
    "convert_lpips",
    "convert_reface_checkpoint",
    "load_torch_state_dict",
]

Array = np.ndarray
StateDict = Mapping[str, Array]


def load_torch_state_dict(path: str) -> dict[str, Array]:
    """Load a torch checkpoint on CPU into plain numpy arrays."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


# ---------------------------------------------------------------- helpers

def _linear_kernel(w: Array) -> Array:
    return np.ascontiguousarray(w.T)


def _conv_kernel(w: Array) -> Array:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _nchw_flat_linear_kernel(w: Array, c: int, h: int, ww: int) -> Array:
    """Linear over a flattened (C,H,W) torch tensor -> NHWC-flatten order."""
    o = w.shape[0]
    w = w.reshape(o, c, h, ww).transpose(0, 2, 3, 1).reshape(o, h * ww * c)
    return np.ascontiguousarray(w.T)


def _flatten_tree(tree: Any, prefix: tuple = ()) -> dict[tuple, Any]:
    out = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(_flatten_tree(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: dict[tuple, Array]) -> dict:
    root: dict = {}
    for path, v in flat.items():
        node = root
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return root


class ConversionError(KeyError):
    pass


def _convert_by_rules(
    flax_shapes: Any,
    torch_sd: StateDict,
    rule: Callable[[tuple], tuple[str, Callable[..., Array]]],
    strict_shapes: bool = True,
) -> dict:
    """For each leaf in flax_shapes, fetch + transform the torch tensor."""
    flat = _flatten_tree(flax_shapes)
    out: dict[tuple, Array] = {}
    missing = []
    for path, ref in flat.items():
        try:
            tkey, xform = rule(path)
        except Exception as e:  # rule itself failed to map
            missing.append(("<rule>", "/".join(path), str(e)))
            continue
        if tkey not in torch_sd:
            missing.append((tkey, "/".join(path), "absent"))
            continue
        arr = np.asarray(torch_sd[tkey])
        arr = xform(arr)
        want = tuple(ref.shape)
        if strict_shapes and tuple(arr.shape) != want:
            raise ConversionError(
                f"shape mismatch {tkey} -> {'/'.join(path)}: "
                f"{arr.shape} vs {want}"
            )
        out[path] = arr.astype(np.dtype(ref.dtype)) if hasattr(ref, "dtype") else arr
    if missing:
        lines = "\n".join(f"  {t} -> {f}: {why}" for t, f, why in missing[:20])
        raise ConversionError(
            f"{len(missing)} unmapped params (first 20):\n{lines}"
        )
    return _unflatten(out)


_ID = lambda a: a


def _leaf_xform(flax_leaf: str, kind: str) -> Callable[[Array], Array]:
    """kind: 'linear' | 'conv' | passthrough for norms/vectors."""
    if flax_leaf == "kernel":
        return _linear_kernel if kind == "linear" else _conv_kernel
    return _ID


# ---------------------------------------------------------------- UNet

def _unet_rule(path: tuple) -> tuple[str, Callable]:
    """flax path under {'params': ...} -> (torch key, transform)."""
    p = list(path)
    assert p[0] == "params"
    p = p[1:]
    leaf = p[-1]

    def norm_key(torch_prefix):
        # GroupNorm32 wraps nn.GroupNorm as child 'GroupNorm_0'
        tleaf = {"scale": "weight", "bias": "bias"}[leaf]
        return f"{torch_prefix}.{tleaf}", _ID

    top = p[0]
    if top == "time_embed_0":
        return f"time_embed.0.{'weight' if leaf=='kernel' else 'bias'}", _leaf_xform(leaf, "linear")
    if top == "time_embed_2":
        return f"time_embed.2.{'weight' if leaf=='kernel' else 'bias'}", _leaf_xform(leaf, "linear")
    if top == "out_norm":
        return norm_key("out.0")
    if top == "out_conv":
        return f"out.2.{'weight' if leaf=='kernel' else 'bias'}", _leaf_xform(leaf, "conv")

    if top == "input_blocks_0_0" and len(p) == 2:
        # stem conv (a bare nn.Conv, no children)
        return (
            f"input_blocks.0.0.{'weight' if leaf == 'kernel' else 'bias'}",
            _leaf_xform(leaf, "conv"),
        )

    m = re.match(r"middle_block_(\d+)$", top)
    if m:
        group = "middle_block"
        tprefix = f"middle_block.{m.group(1)}"
    else:
        m = re.match(r"(input_blocks|output_blocks)_(\d+)_(\d+)$", top)
        if not m:
            raise ValueError(f"unrecognized unet module {top}")
        group = m.group(1)
        tprefix = f"{group}.{m.group(2)}.{m.group(3)}"

    child = p[1]
    tw = "weight" if leaf in ("kernel", "scale") else "bias"

    # ResBlock children
    res_map = {
        "in_norm": ("in_layers.0", "norm"),
        "in_conv": ("in_layers.2", "conv"),
        "emb_proj": ("emb_layers.1", "linear"),
        "out_norm": ("out_layers.0", "norm"),
        "out_conv": ("out_layers.3", "conv"),
        "skip": ("skip_connection", "conv"),
    }
    if child in res_map:
        tsub, kind = res_map[child]
        if kind == "norm":
            return norm_key(f"{tprefix}.{tsub}")
        return f"{tprefix}.{tsub}.{tw}", _leaf_xform(leaf, kind)

    # Down/Upsample child
    if child == "conv":
        # Downsample in torch is `.op`, Upsample is `.conv`
        tsub = "op" if group == "input_blocks" else "conv"
        return f"{tprefix}.{tsub}.{tw}", _leaf_xform(leaf, "conv")

    # SpatialTransformer children
    if child == "norm":
        return norm_key(f"{tprefix}.norm")
    if child in ("proj_in", "proj_out"):
        return f"{tprefix}.{child}.{tw}", _leaf_xform(leaf, "conv")
    m2 = re.match(r"block_(\d+)$", child)
    if m2:
        bt = f"{tprefix}.transformer_blocks.{m2.group(1)}"
        gchild = p[2]
        if gchild in ("norm1", "norm2", "norm3"):
            tleaf = {"scale": "weight", "bias": "bias"}[leaf]
            return f"{bt}.{gchild}.{tleaf}", _ID
        if gchild in ("attn1", "attn2"):
            ggchild = p[3]
            tname = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v",
                     "to_out": "to_out.0"}[ggchild]
            return f"{bt}.{gchild}.{tname}.{tw}", _leaf_xform(leaf, "linear")
        if gchild == "ff":
            tname = {"proj_in": "ff.net.0.proj", "proj_out": "ff.net.2"}[p[3]]
            return f"{bt}.{tname}.{tw}", _leaf_xform(leaf, "linear")
    raise ValueError(f"unmapped unet path {'/'.join(path)}")


def convert_unet(flax_shapes: Any, torch_sd: StateDict, prefix: str = "") -> dict:
    if prefix:
        torch_sd = {k[len(prefix):]: v for k, v in torch_sd.items()
                    if k.startswith(prefix)}
    return _convert_by_rules(flax_shapes, torch_sd, _unet_rule)


def expand_conv_in(torch_sd: dict, in_channels: int = 9,
                   key: str = "model.diffusion_model.input_blocks.0.0.weight") -> dict:
    """Zero-pad a vanilla SD conv_in from 4 to `in_channels` input channels.

    Parity: scripts/modify_checkpoints.py:1-7 — bootstrap a 9-ch REFace UNet
    from the stock sd-v1-4 checkpoint by concatenating zeros(320, 5, 3, 3).
    """
    out = dict(torch_sd)
    w = np.asarray(out[key])
    o, i, kh, kw = w.shape
    if i >= in_channels:
        return out
    pad = np.zeros((o, in_channels - i, kh, kw), w.dtype)
    out[key] = np.concatenate([w, pad], axis=1)
    return out


# ---------------------------------------------------------------- VAE

def _vae_rule(path: tuple) -> tuple[str, Callable]:
    p = list(path)
    assert p[0] == "params"
    p = p[1:]
    leaf = p[-1]
    tw = "weight" if leaf in ("kernel", "scale") else "bias"

    top = p[0]
    if top in ("quant_conv", "post_quant_conv"):
        return f"{top}.{tw}", _leaf_xform(leaf, "conv")

    tower = top  # 'encoder' | 'decoder'
    child = p[1]

    def resnet(tprefix, sub):
        kind = "norm" if sub.startswith("norm") else "conv"
        if kind == "norm":
            tleaf = {"scale": "weight", "bias": "bias"}[leaf]
            return f"{tprefix}.{sub}.{tleaf}", _ID
        return f"{tprefix}.{sub}.{tw}", _leaf_xform(leaf, "conv")

    m = re.match(r"(down|up)_(\d+)_block_(\d+)$", child)
    if m:
        return resnet(f"{tower}.{m.group(1)}.{m.group(2)}.block.{m.group(3)}", p[2])
    m = re.match(r"(down|up)_(\d+)_(downsample|upsample)$", child)
    if m:
        return (
            f"{tower}.{m.group(1)}.{m.group(2)}.{m.group(3)}.conv.{tw}",
            _leaf_xform(leaf, "conv"),
        )
    m = re.match(r"mid_(block_\d|attn_1)$", child)
    if m:
        if "attn" in child:
            sub = p[2]
            if sub == "norm":
                tleaf = {"scale": "weight", "bias": "bias"}[leaf]
                return f"{tower}.mid.attn_1.norm.{tleaf}", _ID
            return f"{tower}.mid.attn_1.{sub}.{tw}", _leaf_xform(leaf, "conv")
        return resnet(f"{tower}.mid.{child[4:]}", p[2])
    if child == "norm_out":
        tleaf = {"scale": "weight", "bias": "bias"}[leaf]
        return f"{tower}.norm_out.{tleaf}", _ID
    if child in ("conv_in", "conv_out"):
        return f"{tower}.{child}.{tw}", _leaf_xform(leaf, "conv")
    raise ValueError(f"unmapped vae path {'/'.join(path)}")


def convert_vae(flax_shapes: Any, torch_sd: StateDict, prefix: str = "") -> dict:
    if prefix:
        torch_sd = {k[len(prefix):]: v for k, v in torch_sd.items()
                    if k.startswith(prefix)}
    return _convert_by_rules(flax_shapes, torch_sd, _vae_rule)


# ---------------------------------------------------------------- CLIP

def _clip_rule(path: tuple) -> tuple[str, Callable]:
    """CLIPConditioner tree: tower/* from HF CLIPModel, mapper2/final_ln2
    from the REFace checkpoint's cond_stage_model."""
    p = list(path)
    assert p[0] == "params"
    p = p[1:]
    leaf = p[-1]
    tw = "weight" if leaf in ("kernel", "scale") else "bias"
    top = p[0]
    V = "model.vision_model"
    if top == "tower":
        child = p[1]
        if child == "class_embedding":
            return f"{V}.embeddings.class_embedding", _ID
        if child == "position_embedding":
            return f"{V}.embeddings.position_embedding.weight", _ID
        if child == "patch_embed":
            return f"{V}.embeddings.patch_embedding.weight", _conv_kernel
        if child == "pre_layernorm":
            tleaf = {"scale": "weight", "bias": "bias"}[leaf]
            return f"{V}.pre_layrnorm.{tleaf}", _ID  # HF's typo'd key
        if child == "post_layernorm":
            tleaf = {"scale": "weight", "bias": "bias"}[leaf]
            return f"{V}.post_layernorm.{tleaf}", _ID
        if child == "visual_projection":
            return "model.visual_projection.weight", _linear_kernel
        m = re.match(r"layer_(\d+)$", child)
        if m:
            L = f"{V}.encoder.layers.{m.group(1)}"
            sub = p[2]
            if sub in ("ln1", "ln2"):
                tleaf = {"scale": "weight", "bias": "bias"}[leaf]
                tn = {"ln1": "layer_norm1", "ln2": "layer_norm2"}[sub]
                return f"{L}.{tn}.{tleaf}", _ID
            if sub == "attn":
                tn = p[3]  # q_proj/k_proj/v_proj/out_proj
                return f"{L}.self_attn.{tn}.{tw}", _leaf_xform(leaf, "linear")
            if sub in ("fc1", "fc2"):
                return f"{L}.mlp.{sub}.{tw}", _leaf_xform(leaf, "linear")
    if top == "mapper2":
        m = re.match(r"block_(\d+)$", p[1])
        B = f"mapper2.resblocks.{m.group(1)}"
        sub = p[2]
        name_map = {
            "ln1": ("ln_1", "norm"),
            "ln2": ("ln_2", "norm"),
            "c_qkv": ("attn.c_qkv", "linear"),
            "c_proj": ("attn.c_proj", "linear"),
            "mlp_fc": ("mlp.c_fc", "linear"),
            "mlp_proj": ("mlp.c_proj", "linear"),
        }
        tn, kind = name_map[sub]
        if kind == "norm":
            tleaf = {"scale": "weight", "bias": "bias"}[leaf]
            return f"{B}.{tn}.{tleaf}", _ID
        return f"{B}.{tn}.{tw}", _leaf_xform(leaf, "linear")
    if top == "final_ln2":
        tleaf = {"scale": "weight", "bias": "bias"}[leaf]
        return f"final_ln2.{tleaf}", _ID
    raise ValueError(f"unmapped clip path {'/'.join(path)}")


def convert_clip_conditioner(flax_shapes: Any, torch_sd: StateDict,
                             prefix: str = "") -> dict:
    if prefix:
        torch_sd = {k[len(prefix):]: v for k, v in torch_sd.items()
                    if k.startswith(prefix)}
    return _convert_by_rules(flax_shapes, torch_sd, _clip_rule)


# ---------------------------------------------------------------- ArcFace

_BN_LEAF = {"scale": "weight", "bias": "bias", "mean": "running_mean",
            "var": "running_var"}


def _arcface_rule(path: tuple) -> tuple[str, Callable]:
    p = list(path)
    assert p[0] == "params"
    p = p[1:]
    leaf = p[-1]
    top = p[0]
    if top == "input_conv":
        return "input_layer.0.weight", _conv_kernel
    if top == "input_bn":
        return f"input_layer.1.{_BN_LEAF[leaf]}", _ID
    if top == "input_prelu":
        return "input_layer.2.weight", _ID
    if top == "output_bn":
        return f"output_layer.0.{_BN_LEAF[leaf]}", _ID
    if top == "output_fc":
        if leaf == "kernel":
            # torch flattens NCHW (512,7,7); our reshape flattens NHWC
            return "output_layer.3.weight", lambda w: _nchw_flat_linear_kernel(
                w, 512, 7, 7
            )
        return "output_layer.3.bias", _ID
    if top == "output_bn1d":
        return f"output_layer.4.{_BN_LEAF[leaf]}", _ID
    m = re.match(r"body_(\d+)$", top)
    if m:
        B = f"body.{m.group(1)}"
        sub = p[1]
        tw = "weight" if leaf in ("kernel", "scale") else "bias"
        sub_map = {
            "shortcut_conv": (f"{B}.shortcut_layer.0.weight", _conv_kernel),
            "conv1": (f"{B}.res_layer.1.weight", _conv_kernel),
            "conv2": (f"{B}.res_layer.3.weight", _conv_kernel),
            "prelu": (f"{B}.res_layer.2.weight", _ID),
        }
        if sub in sub_map and leaf in ("kernel", "alpha"):
            return sub_map[sub]
        if sub == "shortcut_bn":
            return f"{B}.shortcut_layer.1.{_BN_LEAF[leaf]}", _ID
        if sub == "bn0":
            return f"{B}.res_layer.0.{_BN_LEAF[leaf]}", _ID
        if sub == "bn2":
            return f"{B}.res_layer.4.{_BN_LEAF[leaf]}", _ID
        if sub == "se":
            fc = p[2]  # fc1 / fc2
            idx = {"fc1": "fc1", "fc2": "fc2"}[fc]
            return f"{B}.res_layer.5.{idx}.weight", _conv_kernel
    raise ValueError(f"unmapped arcface path {'/'.join(path)}")


def convert_arcface(flax_shapes: Any, torch_sd: StateDict, prefix: str = "") -> dict:
    if prefix:
        torch_sd = {k[len(prefix):]: v for k, v in torch_sd.items()
                    if k.startswith(prefix)}
    return _convert_by_rules(flax_shapes, torch_sd, _arcface_rule)


# ---------------------------------------------------------------- BiSeNet

def _bisenet_rule(path: tuple) -> tuple[str, Callable]:
    """Flax BiSeNet path -> face-parsing checkpoint key (cp.* prefixes)."""
    p = list(path)
    assert p[0] == "params"
    p = p[1:]
    leaf = p[-1]

    def bn(tprefix):
        return f"{tprefix}.{_BN_LEAF[leaf]}", _ID

    def conv(tprefix):
        return f"{tprefix}.weight", _conv_kernel

    def convbn(tprefix, sub):
        # ConvBN module children: conv / bn
        return conv(f"{tprefix}.conv") if sub == "conv" else bn(f"{tprefix}.bn")

    top = p[0]
    if top == "resnet":
        child = p[1]
        R = "cp.resnet"
        if child == "conv1":
            return conv(f"{R}.conv1")
        if child == "bn1":
            return bn(f"{R}.bn1")
        m = re.match(r"layer(\d)_(\d)$", child)
        if m:
            B = f"{R}.layer{m.group(1)}.{m.group(2)}"
            sub = p[2]
            if sub in ("conv1", "conv2"):
                return conv(f"{B}.{sub}")
            if sub in ("bn1", "bn2"):
                return bn(f"{B}.{sub}")
            if sub == "down_conv":
                return conv(f"{B}.downsample.0")
            if sub == "down_bn":
                return bn(f"{B}.downsample.1")
    if top in ("arm16", "arm32"):
        A = f"cp.{top}"
        sub = p[1]
        if sub == "conv":
            return convbn(f"{A}.conv", p[2])
        if sub == "conv_atten":
            return conv(f"{A}.conv_atten")
        if sub == "bn_atten":
            return bn(f"{A}.bn_atten")
    if top in ("conv_avg", "conv_head16", "conv_head32"):
        return convbn(f"cp.{top}", p[1])
    if top == "ffm":
        sub = p[1]
        if sub == "convblk":
            return convbn("ffm.convblk", p[2])
        return conv(f"ffm.{sub}")
    if top in ("conv_out", "conv_out16", "conv_out32"):
        sub = p[1]
        if sub == "conv":
            return convbn(f"{top}.conv", p[2])
        return conv(f"{top}.conv_out")
    raise ValueError(f"unmapped bisenet path {'/'.join(path)}")


def convert_bisenet(flax_shapes: Any, torch_sd: StateDict) -> dict:
    return _convert_by_rules(flax_shapes, torch_sd, _bisenet_rule)


def convert_clip_vision(flax_shapes: Any, torch_sd: StateDict,
                        prefix: str = "") -> dict:
    """Standalone CLIPVisionTower (e.g. the ViT-B/32 FID tower) from an HF
    CLIPModel state dict."""
    if prefix:
        torch_sd = {k[len(prefix):]: v for k, v in torch_sd.items()
                    if k.startswith(prefix)}
    if not any(k.startswith("model.") for k in torch_sd):
        torch_sd = {f"model.{k}": v for k, v in torch_sd.items()}
    wrapped = {"params": {"tower": flax_shapes["params"]}}
    out = _convert_by_rules(wrapped, torch_sd, _clip_rule)
    return {"params": out["params"]["tower"]}


def convert_safety_checker(flax_tower_shapes: Any, torch_sd: StateDict) -> dict:
    """StableDiffusionSafetyChecker state dict -> reface_tpu SafetyChecker
    params.

    Torch layout (diffusers; loaded at import by the reference's batch
    driver, scripts/inference_test_bench.py:48-51):
      vision_model.vision_model.*      CLIPVisionTransformer (ViT-L/14)
      visual_projection.weight         hidden -> 768 projection
      concept_embeds (17,768) / concept_embeds_weights (17,)
      special_care_embeds (3,768) / special_care_embeds_weights (3,)
    """
    sd = {}
    for k, v in torch_sd.items():
        if k.startswith("vision_model.vision_model."):
            sd["model.vision_model." + k[len("vision_model.vision_model."):]] = v
        elif k == "visual_projection.weight":
            sd["model.visual_projection.weight"] = v
    tower = convert_clip_vision(flax_tower_shapes, sd)
    f32 = lambda t: np.asarray(t, np.float32)
    return {
        "tower": tower,
        "concept_embeds": f32(torch_sd["concept_embeds"]),
        "concept_thresholds": f32(torch_sd["concept_embeds_weights"]),
        "special_embeds": f32(torch_sd["special_care_embeds"]),
        "special_thresholds": f32(torch_sd["special_care_embeds_weights"]),
    }


# ---------------------------------------------------------------- LPIPS

# torchvision alexnet.features conv indices -> our tap index
_ALEX_CONV_IDX = {0: 0, 3: 1, 6: 2, 8: 3, 10: 4}


def _lpips_normalize_keys(sd: StateDict) -> dict[str, Array]:
    """Normalize the three LPIPS weight layouts seen in the wild to one:

      - a full module dump of the reference's LPIPS (eval_tool/lpips/lpips.py):
        net.layers.{0,3,6,8,10}.{weight,bias} + lin.{i}.1.weight
      - a raw torchvision AlexNet state dict: features.N.{weight,bias}
      - the official LPIPS calibration file (pre/post get_state_dict rename,
        eval_tool/lpips/utils.py:22-28): lin{i}.model.1.weight or {i}.1.weight
    """
    out: dict[str, Array] = {}
    for k, v in sd.items():
        kk = k
        if kk.startswith("net."):
            kk = kk[len("net."):]
        if kk.startswith("layers."):
            kk = "features." + kk[len("layers."):]
        m = re.match(r"lin\.?(\d)\.(?:model\.)?1\.weight$", kk)
        if m is None:
            m = re.match(r"(\d)\.1\.weight$", kk)
        if m:
            kk = f"lin.{m.group(1)}.1.weight"
        out[kk] = v
    return out


def _lpips_rule(path: tuple) -> tuple[str, Callable]:
    p = list(path)
    assert p[0] == "params"
    p = p[1:]
    leaf = p[-1]
    top = p[0]
    if top == "alex":
        m = re.match(r"conv(\d)$", p[1])
        tidx = {v: k for k, v in _ALEX_CONV_IDX.items()}[int(m.group(1))]
        return (
            f"features.{tidx}.{'weight' if leaf == 'kernel' else 'bias'}",
            _leaf_xform(leaf, "conv"),
        )
    m = re.match(r"lin(\d)$", top)
    if m:
        return f"lin.{m.group(1)}.1.weight", _conv_kernel
    raise ValueError(f"unmapped lpips path {'/'.join(path)}")


def convert_lpips(flax_shapes: Any, torch_sd: StateDict) -> dict:
    """Pretrained LPIPS(alex) -> nn/lpips.py params.

    Parity: eval_tool/lpips/networks.py (torchvision AlexNet.features taps
    after ReLUs 2/5/8/10/12) + the v0.1 'lin' 1x1 calibration weights
    (utils.py:11-30), used as the training perceptual loss at
    ddpm.py:634,1779-1797. Accepts a full LPIPS module dump, or a merged
    dict of torchvision alexnet 'features.*' + official 'lin*' weights.
    """
    return _convert_by_rules(flax_shapes, _lpips_normalize_keys(torch_sd),
                             _lpips_rule)


# ---------------------------------------------------------- ResNet-50 evals

def _resnet50_rule(prefix: str = ""):
    """Rule for torchvision-style ResNet-50 trunks (Hopenet / D3DFR)."""

    def rule(path: tuple) -> tuple[str, Callable]:
        p = list(path)
        assert p[0] == "params"
        p = p[1:]
        leaf = p[-1]
        top = p[0]
        if top == "trunk":
            p = p[1:]
            top = p[0]
        if top == "conv1":
            return f"{prefix}conv1.weight", _conv_kernel
        if top == "bn1":
            return f"{prefix}bn1.{_BN_LEAF[leaf]}", _ID
        m = re.match(r"layer(\d)_(\d+)$", top)
        if m:
            B = f"{prefix}layer{m.group(1)}.{m.group(2)}"
            sub = p[1]
            if sub in ("conv1", "conv2", "conv3"):
                return f"{B}.{sub}.weight", _conv_kernel
            if sub in ("bn1", "bn2", "bn3"):
                return f"{B}.{sub}.{_BN_LEAF[leaf]}", _ID
            if sub == "down_conv":
                return f"{B}.downsample.0.weight", _conv_kernel
            if sub == "down_bn":
                return f"{B}.downsample.1.{_BN_LEAF[leaf]}", _ID
        # dense heads: fc_yaw/fc_pitch/fc_roll (hopenet) or fc (facerecon)
        m = re.match(r"fc(_\w+)?$", top)
        if m:
            tw = "weight" if leaf == "kernel" else "bias"
            return f"{prefix}{top}.{tw}", _leaf_xform(leaf, "linear")
        raise ValueError(f"unmapped resnet50 path {'/'.join(path)}")

    return rule


def convert_hopenet(flax_shapes: Any, torch_sd: StateDict,
                    prefix: str = "") -> dict:
    return _convert_by_rules(flax_shapes, torch_sd, _resnet50_rule(prefix))


def convert_facerecon(flax_shapes: Any, torch_sd: StateDict,
                      prefix: str = "", head_prefix: str | None = None) -> dict:
    """D3DFR coeff regressor: ResNet-50 trunk at {prefix} (e.g.
    'net_recon.backbone.') plus either a single '{prefix}fc' Linear or the
    reference's SEVEN conv1x1 coefficient heads (networks.py:83-91:
    id 80 / exp 64 / tex 80 / angle 3 / gamma 27 / txy 2 / tz 1, applied to
    the pooled (B,2048,1,1) feature) — mathematically one Linear(2048,257),
    concatenated here into our Dense 'fc'."""
    hp = head_prefix
    if hp is None:
        hp = prefix.replace("backbone.", "") + "final_layers."
    if f"{hp}0.weight" in torch_sd:
        ws, bs = [], []
        i = 0
        while f"{hp}{i}.weight" in torch_sd:
            w = np.asarray(torch_sd[f"{hp}{i}.weight"])  # (Ci, 2048, 1, 1)
            ws.append(w[:, :, 0, 0])
            bs.append(np.asarray(
                torch_sd.get(f"{hp}{i}.bias", np.zeros(w.shape[0], np.float32))
            ))
            i += 1
        torch_sd = dict(torch_sd)
        torch_sd[f"{prefix}fc.weight"] = np.concatenate(ws, axis=0)
        torch_sd[f"{prefix}fc.bias"] = np.concatenate(bs, axis=0)
    return _convert_by_rules(flax_shapes, torch_sd, _resnet50_rule(prefix))


# ------------------------------------------------------- full checkpoint

def convert_reface_checkpoint(
    swap_cfg, torch_sd: StateDict, clip_sd: StateDict | None = None,
    arcface_sd: StateDict | None = None,
):
    """Assemble the full {'unet','vae','conditioner'} params from the REFace
    last.ckpt (+ standalone CLIP / ArcFace state dicts when the combined
    checkpoint doesn't embed them under its own prefixes)."""
    import jax
    from reface_tpu.pipelines.swap import FaceSwapper

    shapes = jax.eval_shape(
        lambda k: FaceSwapper.init_params(swap_cfg, k), jax.random.key(0)
    )

    unet = convert_unet(shapes["unet"], torch_sd, prefix="model.diffusion_model.")
    vae = convert_vae(shapes["vae"], torch_sd, prefix="first_stage_model.")

    # conditioner: clip tower+mapper live under cond_stage_model.*,
    # projections at the top level of the REFace checkpoint.
    cond_shapes = shapes["conditioner"]
    clip_src = {
        k[len("cond_stage_model."):]: v
        for k, v in torch_sd.items()
        if k.startswith("cond_stage_model.")
    }
    if clip_sd:
        clip_src.update({f"model.{k}" if not k.startswith("model.") else k: v
                         for k, v in clip_sd.items()})
    clip_tree = convert_clip_conditioner(
        {"params": cond_shapes["params"]["clip_embed"]}, clip_src
    )["params"]

    af_src = arcface_sd or {
        k[len("face_ID_model.facenet."):]: v
        for k, v in torch_sd.items()
        if k.startswith("face_ID_model.facenet.")
    }
    af_tree = convert_arcface(
        {"params": cond_shapes["params"]["face_id"]}, af_src
    )["params"]

    def lin(prefix):
        return {
            "kernel": _linear_kernel(np.asarray(torch_sd[f"{prefix}.weight"])),
            "bias": np.asarray(torch_sd[f"{prefix}.bias"]),
        }

    cond_params = {
        "clip_embed": clip_tree,
        "face_id": af_tree,
        "proj_out_source": lin("proj_out_source"),
        "proj_out_target": lin("proj_out_target"),
        "id_proj_out": lin("ID_proj_out"),
        "landmark_proj_out": lin("landmark_proj_out"),
        "learnable_vector": np.asarray(torch_sd["learnable_vector"]),
    }
    return {"unet": unet, "vae": vae, "conditioner": {"params": cond_params}}
