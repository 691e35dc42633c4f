"""Convert reference PyTorch checkpoints into crop2seg_tpu flax variables.

The reference ships ``model.pth.tar`` state dicts whose keys are
nn.Sequential index paths (e.g. ``out_conv.conv.conv.3.weight``,
cf. /root/reference/train.py:406-408). This module maps them onto the
structured flax module tree, transposing tensor layouts:

    torch Conv2d  (O, I, kh, kw)        -> flax  (kh, kw, I, O)
    torch ConvT2d (I, O, kh, kw)        -> flax forward-HWIO, spatially flipped
    torch Linear  (O, I)                -> flax  (I, O)
    torch Conv1d k=1 (O, I, 1)          -> flax Dense (I, O)
    torch BatchNorm/GroupNorm           -> scale/bias (+ batch_stats)

Works on plain nested dicts (no torch import needed for the tensor math —
tensors arrive as numpy arrays; use ``load_torch_state_dict`` if you have a
.pth file and torch installed).
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into {key: np.ndarray}.

    Accepts either a bare state_dict or the reference's
    ``{state_dict, optimizer, epoch, best_mIoU}`` wrapper
    (/root/reference/train.py:529-541).
    """
    import torch  # local import: torch is optional at runtime

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in blob.items()
            if hasattr(v, "detach")}


# --- tensor-level converters -------------------------------------------------

def conv2d_kernel(w: np.ndarray) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def conv_transpose2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kh, kw) -> our forward-conv HWIO.

    Our ConvTranspose2d computes conv(dilate(x), K) with K in (kh, kw, I, O);
    torch's operation corresponds to K[h, w, i, o] = W[i, o, kh-1-h, kw-1-w].
    """
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear (O, I) -> flax Dense (I, O)."""
    return np.transpose(w)


def conv1d1_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv1d 1x1 (O, I, 1) -> flax Dense (I, O)."""
    return np.transpose(w[:, :, 0])


def depthwise_kernel(w: np.ndarray) -> np.ndarray:
    """torch grouped conv with groups=C: (C, 1, kh, kw) -> (kh, kw, 1, C)."""
    return np.transpose(w, (2, 3, 1, 0))


# --- structured assembly -----------------------------------------------------

def _norm(sd: Mapping[str, np.ndarray], prefix: str, kind: str):
    """Return (params, batch_stats|None) for a torch norm layer at prefix."""
    p: Dict[str, Any] = {}
    if f"{prefix}.weight" in sd:
        p["scale"] = sd[f"{prefix}.weight"]
        p["bias"] = sd[f"{prefix}.bias"]
    stats = None
    if kind == "batch":
        stats = {"mean": sd[f"{prefix}.running_mean"],
                 "var": sd[f"{prefix}.running_var"]}
    return p, stats


def _conv2d(sd, prefix):
    p = {"kernel": conv2d_kernel(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _dws_conv(sd, prefix):
    """DepthwiseSeparableConv2D (reference conv.py:11-26)."""
    return {
        "depthwise": {"conv": {"kernel": depthwise_kernel(sd[f"{prefix}.depthwise.weight"])}},
        "pointwise": {"conv": {"kernel": conv2d_kernel(sd[f"{prefix}.pointwise.weight"])}},
    }


def _se(sd, prefix):
    """SqueezeAndExcitation: sae.1 / sae.3 Linears (reference s&e.py:16-23)."""
    return {"fc1": {"kernel": dense_kernel(sd[f"{prefix}.sae.1.weight"])},
            "fc2": {"kernel": dense_kernel(sd[f"{prefix}.sae.3.weight"])}}


def convert_conv_layer(sd: Mapping[str, np.ndarray], prefix: str,
                       n_convs: int, norm: str, conv_type: str = "2d",
                       add_squeeze: bool = False):
    """ConvLayer at ``prefix`` (torch Sequential under ``{prefix}.conv``).

    Sequential layout per unit: conv, [norm], [relu] (reference conv.py:70-93);
    relu has no params so torch indexes are conv=3i, norm=3i+1 when norm+relu
    present. Instance norm has no params -> stride 2 w/ relu... indexes are
    computed robustly by scanning existing keys instead.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    # scan sequential indices that own weights
    idxs = sorted({int(m.group(1)) for k in sd
                   for m in [re.match(re.escape(prefix) + r"\.conv\.(\d+)\.", k)] if m})
    conv_i = 0
    for idx in idxs:
        kp = f"{prefix}.conv.{idx}"
        if f"{kp}.running_mean" in sd:  # batch norm
            p, st = _norm(sd, kp, "batch")
            params[f"norm{conv_i - 1}"] = p
            stats[f"norm{conv_i - 1}"] = st
        elif f"{kp}.depthwise.weight" in sd:
            params[f"conv{conv_i}"] = _dws_conv(sd, kp)
            conv_i += 1
        elif f"{kp}.weight" in sd and sd[f"{kp}.weight"].ndim == 4:
            params[f"conv{conv_i}"] = {"conv": _conv2d(sd, kp)}
            conv_i += 1
        elif f"{kp}.weight" in sd and sd[f"{kp}.weight"].ndim == 1:  # group norm
            p, _ = _norm(sd, kp, "group")
            params[f"norm{conv_i - 1}"] = p
        elif f"{kp}.sae.1.weight" in sd:
            params["se"] = _se(sd, kp)
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def merge_tree(dst: Dict, src: Mapping, path=()):
    """Deep-merge src into dst."""
    for k, v in src.items():
        if isinstance(v, Mapping) and isinstance(dst.get(k), dict):
            merge_tree(dst[k], v, path + (k,))
        else:
            dst[k] = v
    return dst


# --- module-level converters ---------------------------------------------

def _j(prefix: str, name: str) -> str:
    """Join a (possibly empty) torch key prefix with a sub-name."""
    return f"{prefix}.{name}" if prefix else name


def convert_up_block(sd, prefix):
    """UpConvBlock at ``prefix`` (reference conv.py:362-413)."""
    params = {
        "up_conv": {"kernel": conv_transpose2d_kernel(sd[_j(prefix, "up.0.weight")]),
                    "bias": sd[_j(prefix, "up.0.bias")]},
        "skip_conv": {"conv": _conv2d(sd, _j(prefix, "skip_conv.0"))},
    }
    stats = {}
    p, st = _norm(sd, _j(prefix, "up.1"), "batch")
    params["up_norm"], stats["up_norm"] = p, st
    p, st = _norm(sd, _j(prefix, "skip_conv.1"), "batch")
    params["skip_norm"], stats["skip_norm"] = p, st
    for name in ("conv1", "conv2"):
        sub = convert_conv_layer(sd, _j(prefix, name), 1, "batch")
        params[name] = sub["params"]
        if "batch_stats" in sub:
            stats[name] = sub["batch_stats"]
    return {"params": params, "batch_stats": stats}


def convert_down_block(sd, prefix):
    """DownConvBlock at ``prefix`` (reference conv.py:238-296)."""
    params, stats = {}, {}
    for name in ("down", "conv1", "conv2"):
        sub = convert_conv_layer(sd, _j(prefix, name), 1, "any")
        params[name] = sub["params"]
        if "batch_stats" in sub:
            stats[name] = sub["batch_stats"]
    if _j(prefix, "sae.sae.1.weight") in sd:
        params["se"] = _se(sd, _j(prefix, "sae"))
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def convert_positional_encoder(sd, prefix, absolute=False):
    """PositionalEncoder / AbsolutePositionalEncoder params (may be empty)."""
    if absolute:
        return {"embedding": dense_kernel(sd[_j(prefix, "fc.weight")]),
                "bias": sd[_j(prefix, "fc.bias")]}
    if _j(prefix, "fc.weight") in sd:
        return {"fc": {"kernel": dense_kernel(sd[_j(prefix, "fc.weight")]),
                       "bias": sd[_j(prefix, "fc.bias")]}}
    return {}


def convert_ltae(sd, prefix, use_doy=False, add_linear=False,
                 use_abs_rel_enc=False, with_mlp=True):
    """LTAE / LTAE4WTAE at ``prefix`` (reference tae.py:349-635)."""
    params = {
        "in_norm_scale": sd[_j(prefix, "in_norm.weight")],
        "in_norm_bias": sd[_j(prefix, "in_norm.bias")],
        "attention": {
            "query": sd[_j(prefix, "attention_head.Q")],
            "fc1_k": {"kernel": dense_kernel(sd[_j(prefix, "attention_head.fc1_k.weight")]),
                      "bias": sd[_j(prefix, "attention_head.fc1_k.bias")]},
        },
    }
    if _j(prefix, "inconv.weight") in sd:
        params["inconv"] = {"kernel": conv1d1_kernel(sd[_j(prefix, "inconv.weight")]),
                            "bias": sd[_j(prefix, "inconv.bias")]}
    pe_abs = use_doy and not add_linear
    pe = convert_positional_encoder(sd, _j(prefix, "positional_encoder"),
                                    absolute=pe_abs)
    if pe:
        params["positional_encoder"] = pe
    if use_abs_rel_enc:
        params["positional_encoder_abs"] = convert_positional_encoder(
            sd, _j(prefix, "positional_encoder_abs"), absolute=True)
    stats = {}
    if with_mlp:
        params["out_norm_scale"] = sd[_j(prefix, "out_norm.weight")]
        params["out_norm_bias"] = sd[_j(prefix, "out_norm.bias")]
        params["mlp_dense"] = {"kernel": dense_kernel(sd[_j(prefix, "mlp.0.weight")]),
                               "bias": sd[_j(prefix, "mlp.0.bias")]}
        p, st = _norm(sd, _j(prefix, "mlp.2"), "batch")
        params["mlp_bn"], stats["mlp_bn"] = p, st
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def _stitch(dst_params, dst_stats, name, sub):
    dst_params[name] = sub["params"]
    if "batch_stats" in sub:
        dst_stats[name] = sub["batch_stats"]


def convert_utae(sd, n_stages=4, use_doy=False, add_linear=False,
                 use_abs_rel_enc=False, add_boundary=False, use_mbconv=False):
    """Full UTAE state dict -> flax variables (reference utae.py:14-252).
    ``use_mbconv`` switches every conv block to the MBConv family
    (reference utae.py:118-127)."""
    params, stats = {}, {}
    if use_mbconv:
        # prefix is "<block>.conv"; MBConvBlock's MBConvLayer lives at the
        # same path (units at "<block>.conv.conv.{j}"), and the caller adds
        # the flax "conv" wrapper — so return the layer's flat dict here.
        def conv2_block(prefix):
            return convert_mbconv_layer(sd, prefix, 2)

        def down_block(prefix):
            return convert_mb_down_block(sd, prefix)

        def up_block(prefix):
            return convert_mb_up_block(sd, prefix)
    else:
        def conv2_block(prefix):
            return convert_conv_layer(sd, prefix, 2, "any")

        def down_block(prefix):
            return convert_down_block(sd, prefix)

        def up_block(prefix):
            return convert_up_block(sd, prefix)

    _stitch(params, stats, "in_conv", conv2_block("in_conv.conv"))
    params["in_conv"] = {"conv": params["in_conv"]}
    if "in_conv" in stats:
        stats["in_conv"] = {"conv": stats["in_conv"]}
    for i in range(n_stages - 1):
        _stitch(params, stats, f"down_{i}", down_block(f"down_blocks.{i}"))
        _stitch(params, stats, f"up_{i}", up_block(f"up_blocks.{i}"))
    _stitch(params, stats, "temporal_encoder",
            convert_ltae(sd, "temporal_encoder", use_doy=use_doy,
                         add_linear=add_linear, use_abs_rel_enc=use_abs_rel_enc))
    oc = conv2_block("out_conv.conv")
    params["out_conv"] = {"conv": oc["params"]}
    if "batch_stats" in oc:
        stats["out_conv"] = {"conv": oc["batch_stats"]}
    if add_boundary:
        bc = conv2_block("boundary_conv.conv")
        params["boundary_conv"] = {"conv": bc["params"]}
        if "batch_stats" in bc:
            stats["boundary_conv"] = {"conv": bc["batch_stats"]}
    return {"params": params, "batch_stats": stats}


def convert_timeunet(sd, n_stages=4, use_doy=False, add_linear=False,
                     use_abs_rel_enc=False, **_):
    """TimeUNet_v1 state dict -> flax variables (reference timeunet.py:10-210).

    Identical module inventory to UTAE minus aggregator (no params) and
    boundary head; layout of names matches our TimeUNet module. Extra kwargs
    (e.g. add_boundary) are accepted-and-ignored so callers can pass one
    config to any converter."""
    return convert_utae(sd, n_stages=n_stages, use_doy=use_doy,
                        add_linear=add_linear, use_abs_rel_enc=use_abs_rel_enc)


def convert_wtae(sd, n_stages=4, use_doy=False, add_linear=False,
                 use_abs_rel_enc=False, add_boundary=False):
    """WTAE state dict -> flax variables (reference wtae.py:15-279)."""
    params, stats = {}, {}
    _stitch(params, stats, "in_conv", convert_conv_layer(sd, "in_conv.conv", 2, "any"))
    params["in_conv"] = {"conv": params["in_conv"]}
    if "in_conv" in stats:
        stats["in_conv"] = {"conv": stats["in_conv"]}
    for i in range(n_stages - 1):
        _stitch(params, stats, f"spatial_reduction_{i}",
                convert_down_block(sd, f"spatial_reduction.{i}"))
        _stitch(params, stats, f"down_{i}", convert_down_block(sd, f"down_blocks.{i}"))
        _stitch(params, stats, f"up_{i}", convert_up_block(sd, f"up_blocks.{i}"))
    _stitch(params, stats, "temporal_encoder",
            convert_ltae(sd, "temporal_encoder", use_doy=use_doy,
                         add_linear=add_linear, use_abs_rel_enc=use_abs_rel_enc,
                         with_mlp=False))
    oc = convert_conv_layer(sd, "out_conv.conv", 2, "any")
    params["out_conv"] = {"conv": oc["params"]}
    if "batch_stats" in oc:
        stats["out_conv"] = {"conv": oc["batch_stats"]}
    if add_boundary:
        bc = convert_conv_layer(sd, "boundary_conv.conv", 2, "any")
        params["boundary_conv"] = {"conv": bc["params"]}
        if "batch_stats" in bc:
            stats["boundary_conv"] = {"conv": bc["batch_stats"]}
    return {"params": params, "batch_stats": stats}


# --- MBConv family -----------------------------------------------------------

def convert_mbconv(sd, prefix):
    """Single MBConv unit (reference mbconv.py:25-96). The torch module is
    Sequential(Sequential(residual(Sequential(...)))), so parameter keys live
    under ``{prefix}.0.0`` — or ``{prefix}.0.0.block`` when in==out channels
    (ResidualAdd). Inner Sequential indices: 0 expand 1x1, 1 norm, 3 depthwise
    3x3, 4 norm, 6 SE, 7 project 1x1, 8 norm."""
    # residual = ResidualAdd (in==out) nests under ".block"; otherwise the
    # residual wrapper is a plain nn.Sequential adding one more ".0" level.
    base = f"{prefix}.0.0"
    base = base + (".block" if any(k.startswith(base + ".block.")
                                   for k in sd) else ".0")
    params: Dict[str, Any] = {
        "expand": {"conv": _conv2d(sd, f"{base}.0")},
        "depthwise": {"conv": {
            "kernel": depthwise_kernel(sd[f"{base}.3.weight"]),
            "bias": sd[f"{base}.3.bias"]}},
        "project": {"conv": _conv2d(sd, f"{base}.7")},
    }
    stats: Dict[str, Any] = {}
    for name, idx in (("norm0", 1), ("norm1", 4), ("norm2", 8)):
        kp = f"{base}.{idx}"
        if f"{kp}.running_mean" in sd:
            p, st = _norm(sd, kp, "batch")
            params[name], stats[name] = p, st
        elif f"{kp}.weight" in sd:
            params[name], _ = _norm(sd, kp, "group")
    if f"{base}.6.sae.1.weight" in sd:
        params["se"] = _se(sd, f"{base}.6")
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def convert_mbconv_layer(sd, prefix, n_units):
    """MBConvLayer: Sequential of MBConv at ``{prefix}.conv.{j}``
    (reference mbconv.py:99-129)."""
    params, stats = {}, {}
    for j in range(n_units):
        sub = convert_mbconv(sd, f"{prefix}.conv.{j}")
        params[f"mbconv{j}"] = sub["params"]
        if "batch_stats" in sub:
            stats[f"mbconv{j}"] = sub["batch_stats"]
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def convert_mbconv_block(sd, prefix, n_units):
    """MBConvBlock: self.conv = MBConvLayer (reference mbconv.py:132-152)."""
    sub = convert_mbconv_layer(sd, f"{prefix}.conv", n_units)
    out = {"params": {"conv": sub["params"]}}
    if "batch_stats" in sub:
        out["batch_stats"] = {"conv": sub["batch_stats"]}
    return out


def convert_mb_down_block(sd, prefix):
    """MBDownConvBlock (reference mbconv.py:155-198)."""
    params, stats = {}, {}
    sub = convert_conv_layer(sd, f"{prefix}.down", 1, "any")
    params["down"] = sub["params"]
    if "batch_stats" in sub:
        stats["down"] = sub["batch_stats"]
    for name in ("conv1", "conv2"):
        s2 = convert_mbconv_layer(sd, f"{prefix}.{name}", 1)
        params[name] = s2["params"]
        if "batch_stats" in s2:
            stats[name] = s2["batch_stats"]
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def convert_mb_up_block(sd, prefix):
    """MBUpConvBlock (reference mbconv.py:201-245)."""
    params = {
        "up_conv": {"kernel": conv_transpose2d_kernel(sd[f"{prefix}.up.0.weight"]),
                    "bias": sd[f"{prefix}.up.0.bias"]},
        "skip_conv": {"conv": _conv2d(sd, f"{prefix}.skip_conv.0")},
    }
    stats = {}
    p, st = _norm(sd, f"{prefix}.up.1", "batch")
    params["up_norm"], stats["up_norm"] = p, st
    p, st = _norm(sd, f"{prefix}.skip_conv.1", "batch")
    params["skip_norm"], stats["skip_norm"] = p, st
    for name in ("conv1", "conv2"):
        s2 = convert_mbconv_layer(sd, f"{prefix}.{name}", 1)
        params[name] = s2["params"]
        if "batch_stats" in s2:
            stats[name] = s2["batch_stats"]
    return {"params": params, "batch_stats": stats}


def convert_tae2d(sd, classical=True, n_stages=1, add_linear=False):
    """TAE2d state dict -> flax variables (reference tae.py:15-346).
    ``classical`` selects the MultiHeadAttention stages
    (``attention_heads.{i}`` -> ``attention_{i}``); otherwise the single
    lightweight head (``attention_heads.0`` -> ``attention``)."""
    params: Dict[str, Any] = {
        "in_norm_scale": sd["in_norm.weight"],
        "in_norm_bias": sd["in_norm.bias"],
        "out_norm_scale": sd["out_norm.weight"],
        "out_norm_bias": sd["out_norm.bias"],
        "mlp_dense": {"kernel": dense_kernel(sd["mlp.0.weight"]),
                      "bias": sd["mlp.0.bias"]},
    }
    stats: Dict[str, Any] = {}
    p, st = _norm(sd, "mlp.1", "batch")
    params["mlp_bn"], stats["mlp_bn"] = p, st
    if "inconv.weight" in sd:
        params["inconv"] = {"kernel": conv1d1_kernel(sd["inconv.weight"]),
                            "bias": sd["inconv.bias"]}
    pe = convert_positional_encoder(sd, "positional_encoder")
    if pe:
        params["positional_encoder"] = pe
    if "cls_token" in sd:  # (nct, C, H, W) -> (nct, H, W, C)
        params["cls_token"] = np.transpose(sd["cls_token"], (0, 2, 3, 1))
    for tname, oname in (("cls_emb_conv", "cls_emb_conv"),
                         ("cls_attn_conv", "cls_attn_conv")):
        if f"{tname}.weight" in sd:  # Conv1d(nct, 1, 1) == Dense(nct -> 1)
            params[oname] = {
                "kernel": dense_kernel(sd[f"{tname}.weight"][:, :, 0]),
                "bias": sd[f"{tname}.bias"]}
    for tname, oname in (("linear_embedding_reduction", "emb_reduce"),
                         ("linear_attention_mask_reduction", "attn_reduce")):
        if f"{tname}.1.weight" in sd:  # Sequential(AdaptiveAvgPool1d, Linear)
            params[oname] = {
                "kernel": dense_kernel(sd[f"{tname}.1.weight"]),
                "bias": sd[f"{tname}.1.bias"]}
    if classical:
        for i in range(n_stages):
            ap = f"attention_heads.{i}"
            params[f"attention_{i}"] = {
                "fc_q": {"kernel": dense_kernel(sd[f"{ap}.fc_q.weight"]),
                         "bias": sd[f"{ap}.fc_q.bias"]},
                "fc_k": {"kernel": dense_kernel(sd[f"{ap}.fc_k.weight"]),
                         "bias": sd[f"{ap}.fc_k.bias"]},
                "fc_v": {"kernel": dense_kernel(sd[f"{ap}.fc_v.weight"]),
                         "bias": sd[f"{ap}.fc_v.bias"]},
                "fc_out": {"kernel": dense_kernel(sd[f"{ap}.fc_out.weight"])},
                "layer_norm": {"scale": sd[f"{ap}.layer_norm.weight"],
                               "bias": sd[f"{ap}.layer_norm.bias"]},
            }
    else:
        params["attention"] = {
            "query": sd["attention_heads.0.Q"],
            "fc1_k": {"kernel": dense_kernel(sd["attention_heads.0.fc1_k.weight"]),
                      "bias": sd["attention_heads.0.fc1_k.bias"]},
        }
    return {"params": params, "batch_stats": stats}


def convert_timeunet_v2(sd, n_stages=3, **_):
    """TimeUNet_v2 state dict -> flax variables (reference
    timeunet.py:214-429). The golden fixture is generated with the
    documented constructor/forward patches in scripts/make_golden.py
    (``timeunet_v2_patched``) — the parameters themselves are the
    reference's own; only the broken glue is corrected."""
    params, stats = {}, {}
    _stitch(params, stats, "in_conv",
            convert_conv_layer(sd, "in_conv.conv", 2, "any"))
    params["in_conv"] = {"conv": params["in_conv"]}
    if "in_conv" in stats:
        stats["in_conv"] = {"conv": stats["in_conv"]}
    for i in range(n_stages - 1):
        _stitch(params, stats, f"down_{i}",
                convert_down_block(sd, f"down_blocks.{i}"))
        _stitch(params, stats, f"up_{i}", convert_up_block(sd, f"up_blocks.{i}"))
    for name, classical in (("temporal_encoder_full_resolution", True),
                            ("temporal_encoder_low_resolution", False)):
        sub = {k[len(name) + 1:]: v for k, v in sd.items()
               if k.startswith(name + ".")}
        _stitch(params, stats, name, convert_tae2d(sub, classical=classical))
    oc = convert_conv_layer(sd, "out_conv.conv", 2, "any")
    params["out_conv"] = {"conv": oc["params"]}
    if "batch_stats" in oc:
        stats["out_conv"] = {"conv": oc["batch_stats"]}
    return {"params": params, "batch_stats": stats}


def _convmodule_ex(sd, prefix):
    """ConvModule_ex (bias-free conv + BN + act) at ``prefix``."""
    p, st = _norm(sd, f"{prefix}.norm", "batch")
    return ({"conv": {"kernel": conv2d_kernel(sd[f"{prefix}.conv.weight"])},
             "norm": p}, {"norm": st})


def convert_unet_ex(sd, num_stages=3, enc_num_convs=(2, 2, 2),
                    dec_num_convs=(2, 2)):
    """UNet_ex state dict -> flax variables (reference unet.py:553-690).
    Encoder stage i>0 is Sequential(MaxPool, Block) — the block sits at
    torch index 1; decoder j upsamples via InterpConv_ex whose 1x1
    ConvModule is ``interp_upsample.1`` (Upsample at index 0)."""
    params, stats = {}, {}
    for i in range(num_stages):
        base = f"encoder.{i}.{1 if i > 0 else 0}.convs"
        ep, es = {}, {}
        for j in range(enc_num_convs[i]):
            p, st = _convmodule_ex(sd, f"{base}.{j}")
            ep[f"conv{j}"], es[f"conv{j}"] = p, st
        params[f"encoder_{i}"], stats[f"encoder_{i}"] = ep, es
    for j in range(num_stages - 1):
        dp, ds = {}, {}
        p, st = _convmodule_ex(sd, f"decoder.{j}.upsample.interp_upsample.1")
        dp["upsample"], ds["upsample"] = {"conv": p}, {"conv": st}
        cb, cbs = {}, {}
        for k in range(dec_num_convs[j]):
            p, st = _convmodule_ex(sd, f"decoder.{j}.conv_block.convs.{k}")
            cb[f"conv{k}"], cbs[f"conv{k}"] = p, st
        dp["conv_block"], ds["conv_block"] = cb, cbs
        params[f"decoder_{j}"], stats[f"decoder_{j}"] = dp, ds
    return {"params": params, "batch_stats": stats}


def convert_mlp_mixer(sd, num_layers):
    """MLPMixer state dict -> flax variables (reference mlp_mixer.py:9-81).
    Per layer: norm1/norm2 LayerNorms, token_mixer Linears at Sequential
    indices 0 and 3, channel_mixer likewise."""
    params = {}
    for i in range(num_layers):
        p = f"layers.{i}"
        params[f"layer_{i}"] = {
            "LayerNorm_0": {"scale": sd[f"{p}.norm1.weight"],
                            "bias": sd[f"{p}.norm1.bias"]},
            "Dense_0": {"kernel": dense_kernel(sd[f"{p}.token_mixer.0.weight"]),
                        "bias": sd[f"{p}.token_mixer.0.bias"]},
            "Dense_1": {"kernel": dense_kernel(sd[f"{p}.token_mixer.3.weight"]),
                        "bias": sd[f"{p}.token_mixer.3.bias"]},
            "LayerNorm_1": {"scale": sd[f"{p}.norm2.weight"],
                            "bias": sd[f"{p}.norm2.bias"]},
            "Dense_2": {"kernel": dense_kernel(sd[f"{p}.channel_mixer.0.weight"]),
                        "bias": sd[f"{p}.channel_mixer.0.bias"]},
            "Dense_3": {"kernel": dense_kernel(sd[f"{p}.channel_mixer.3.weight"]),
                        "bias": sd[f"{p}.channel_mixer.3.bias"]},
        }
    return {"params": params}


def convert_unet_naive(sd, n_stages=4):
    """Unet_naive state dict -> flax variables (reference unet.py:172-349).
    Same module inventory as UTAE minus the temporal encoder; all norms are
    BatchNorm."""
    params, stats = {}, {}
    _stitch(params, stats, "in_conv",
            convert_conv_layer(sd, "in_conv.conv", 2, "any"))
    params["in_conv"] = {"conv": params["in_conv"]}
    if "in_conv" in stats:
        stats["in_conv"] = {"conv": stats["in_conv"]}
    for i in range(n_stages - 1):
        _stitch(params, stats, f"down_{i}",
                convert_down_block(sd, f"down_blocks.{i}"))
        _stitch(params, stats, f"up_{i}", convert_up_block(sd, f"up_blocks.{i}"))
    oc = convert_conv_layer(sd, "out_conv.conv", 2, "any")
    params["out_conv"] = {"conv": oc["params"]}
    if "batch_stats" in oc:
        stats["out_conv"] = {"conv": oc["batch_stats"]}
    return {"params": params, "batch_stats": stats}


# --- recurrent + 3-D model converters --------------------------------------

def _conv3d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv3d (O, I, kd, kh, kw) -> flax (kd, kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def _conv_transpose3d_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose3d (I, O, kd, kh, kw) -> our forward DHWIO,
    spatially flipped (see crop2seg_tpu.models.unet3d._deconv3d)."""
    return np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1))


def convert_convlstm_seg(sd):
    """ConvLSTM_Seg (reference convlstm.py:207-236)."""
    return {"params": {
        "encoder": {"cell": {"conv": {"conv": _conv2d(
            sd, "convlstm_encoder.cell_list.0.conv")}}},
        "classifier": {"conv": _conv2d(sd, "classification_layer")},
    }}


def convert_bconvlstm_seg(sd):
    """BConvLSTM_Seg (reference convlstm.py:239-287)."""
    return {"params": {
        "encoder": {
            "forward": {"cell": {"conv": {"conv": _conv2d(
                sd, "convlstm_forward.cell_list.0.conv")}}},
            "backward": {"cell": {"conv": {"conv": _conv2d(
                sd, "convlstm_backward.cell_list.0.conv")}}},
        },
        "classifier": {"conv": _conv2d(sd, "classification_layer")},
    }}


def convert_convgru_seg(sd):
    """ConvGRU_Seg (reference convgru.py:199-226)."""
    return {"params": {
        "encoder": {"cell": {
            "in_conv": {"conv": _conv2d(sd, "convgru_encoder.cell_list.0.in_conv")},
            "out_conv": {"conv": _conv2d(sd, "convgru_encoder.cell_list.0.out_conv")},
        }},
        "classifier": {"conv": _conv2d(sd, "classification_layer")},
    }}


def convert_unet3d(sd):
    """UNet3D (reference unet3d.py:52-112): Sequential index -> named map."""
    params, stats = {}, {}

    def conv3(name, prefix):
        params[f"{name}_conv"] = {
            "kernel": _conv3d_kernel(sd[f"{prefix}.weight"]),
            "bias": sd[f"{prefix}.bias"]}

    def bn(name, prefix):
        params[f"{name}_bn"] = {"scale": sd[f"{prefix}.weight"],
                                "bias": sd[f"{prefix}.bias"]}
        stats[f"{name}_bn"] = {"mean": sd[f"{prefix}.running_mean"],
                               "var": sd[f"{prefix}.running_var"]}

    for tag, tprefix in (("en3", "en3"), ("en4", "en4"), ("dc4", "dc4"),
                         ("dc3", "dc3")):
        conv3(f"{tag}a", f"{tprefix}.0")
        bn(f"{tag}a", f"{tprefix}.1")
        conv3(f"{tag}b", f"{tprefix}.3")
        bn(f"{tag}b", f"{tprefix}.4")
    conv3("center_in", "center_in.0")
    bn("center_in", "center_in.1")
    conv3("center_mid", "center_out.0")
    bn("center_mid", "center_out.1")
    params["center_out_kernel"] = _conv_transpose3d_kernel(sd["center_out.3.weight"])
    params["center_out_bias"] = sd["center_out.3.bias"]
    params["trans3_kernel"] = _conv_transpose3d_kernel(sd["trans3.0.weight"])
    params["trans3_bias"] = sd["trans3.0.bias"]
    bn("trans3", "trans3.1")
    params["final"] = {"kernel": _conv3d_kernel(sd["final.weight"]),
                       "bias": sd["final.bias"]}
    return {"params": params, "batch_stats": stats}


def convert_recunet(sd, n_stages=3):
    """RecUNet temporal='lstm' (reference recunet.py:10-171)."""
    params, stats = {}, {}
    ic = convert_conv_layer(sd, "in_conv.conv", 2, "any")
    params["in_conv"] = {"conv": ic["params"]}
    if "batch_stats" in ic:
        stats["in_conv"] = {"conv": ic["batch_stats"]}
    for i in range(n_stages - 1):
        _stitch(params, stats, f"down_{i}", convert_down_block(sd, f"down_blocks.{i}"))
        _stitch(params, stats, f"up_{i}", convert_up_block(sd, f"up_blocks.{i}"))
    params["temporal_encoder"] = {"cell": {"conv": {"conv": _conv2d(
        sd, "temporal_encoder.cell_list.0.conv")}}}
    params["out_convlstm"] = {"conv": _conv2d(sd, "out_convlstm")}
    oc = convert_conv_layer(sd, "out_conv.conv", 2, "any")
    params["out_conv"] = {"conv": oc["params"]}
    if "batch_stats" in oc:
        stats["out_conv"] = {"conv": oc["batch_stats"]}
    return {"params": params, "batch_stats": stats}
