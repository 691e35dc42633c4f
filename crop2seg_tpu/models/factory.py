"""Model factory: single construction point, keyed on config.model
(reference /root/reference/src/learning/utils.py:50-195)."""
from __future__ import annotations

from typing import Any, Mapping


def _remat_policy(cfg: Mapping[str, Any]):
    """Validated remat policy: 'conv_out' (store conv outputs, recompute only
    the GN/ReLU tails — measured 377 -> 352 ms/step on UTAE B=16 bf16 v5e,
    identical grads) or 'full' (recompute everything, lowest memory). A typo
    must fail loudly: an unknown string silently degrading to full recompute
    costs ~7% step time (ADVICE r3)."""
    policy = cfg.get("remat_policy", "conv_out")
    if policy not in ("conv_out", "full"):
        raise ValueError(
            f"unknown remat_policy {policy!r}: expected 'conv_out' or 'full'")
    return None if policy == "full" else policy


def get_model(config: Mapping[str, Any] | Any):
    """Accepts a dict or namespace with the reference train.py flag names."""
    cfg = config if isinstance(config, Mapping) else vars(config)
    name = cfg["model"]
    common = dict(
        input_dim=cfg.get("input_dim", 10),
        encoder_widths=tuple(cfg.get("encoder_widths", (64, 64, 64, 128))),
        decoder_widths=tuple(cfg.get("decoder_widths", (32, 32, 64, 128))),
        out_conv=tuple(cfg.get("out_conv", (32, 15))),
        str_conv_k=cfg.get("str_conv_k", 4),
        str_conv_s=cfg.get("str_conv_s", 2),
        str_conv_p=cfg.get("str_conv_p", 1),
        encoder_norm=cfg.get("encoder_norm", "group"),
        n_head=cfg.get("n_head", 16),
        d_model=cfg.get("d_model", 256),
        d_k=cfg.get("d_k", 4),
        pad_value=cfg.get("pad_value", 0.0),
        padding_mode=cfg.get("padding_mode", "reflect"),
        conv_type=cfg.get("conv_type", "2d"),
        add_squeeze_excit=cfg.get("add_squeeze", False),
        use_abs_rel_enc=cfg.get("use_abs_rel_enc", False),
        num_queries=cfg.get("num_queries", 1),
        use_doy=cfg.get("use_doy", False),
        add_linear=cfg.get("add_linear", False),
        dtype=cfg.get("dtype", None),
    )
    if name == "utae":
        from crop2seg_tpu.models.utae import UTAE
        return UTAE(agg_mode=cfg.get("agg_mode", "att_group"),
                    use_mbconv=cfg.get("use_mbconv", False),
                    add_boundary_loss=cfg.get("add_boundary_loss", False),
                    use_pallas=cfg.get("use_pallas", False),
                    remat=cfg.get("remat", False),
                    remat_policy=_remat_policy(cfg),
                    **common)
    if name == "wtae":
        from crop2seg_tpu.models.wtae import WTAE
        return WTAE(agg_mode=cfg.get("agg_mode", "att_group"),
                    use_mbconv=cfg.get("use_mbconv", False),
                    add_boundary_loss=cfg.get("add_boundary_loss", False),
                    remat=cfg.get("remat", False),
                    remat_policy=_remat_policy(cfg),
                    **common)
    if name in ("timeunet", "timeunet_v1"):
        from crop2seg_tpu.models.timeunet import TimeUNet
        return TimeUNet(use_pallas=cfg.get("use_pallas", False),
                        use_pallas_train=cfg.get("use_pallas_train", False),
                        seq_chunk=cfg.get("seq_chunk", None),
                        remat=cfg.get("remat", False), **common)
    if name == "timeunet_v2":
        from crop2seg_tpu.models.timeunet_v2 import TimeUNetV2
        common_v2 = {k: v for k, v in common.items()
                     if k not in ("num_queries", "use_doy", "add_linear")}
        return TimeUNetV2(agg_mode=cfg.get("agg_mode", "att_group"),
                          **common_v2)
    if name == "unet3d":
        from crop2seg_tpu.models.unet3d import UNet3D
        return UNet3D(n_classes=cfg.get("num_classes", 15),
                      pad_value=cfg.get("pad_value", 0.0),
                      dtype=cfg.get("dtype", None))
    if name == "convlstm":
        from crop2seg_tpu.models.convlstm import ConvLSTMSeg
        return ConvLSTMSeg(num_classes=cfg.get("num_classes", 15),
                           input_dim=cfg.get("input_dim", 10),
                           hidden_dim=160, kernel_size=3,
                           pad_value=cfg.get("pad_value", 0.0),
                           dtype=cfg.get("dtype", None))
    if name == "convgru":
        from crop2seg_tpu.models.convgru import ConvGRUSeg
        return ConvGRUSeg(num_classes=cfg.get("num_classes", 15),
                          input_dim=cfg.get("input_dim", 10),
                          hidden_dim=180, kernel_size=3,
                          pad_value=cfg.get("pad_value", 0.0),
                          dtype=cfg.get("dtype", None))
    if name == "uconvlstm":
        from crop2seg_tpu.models.recunet import RecUNet
        return RecUNet(input_dim=cfg.get("input_dim", 10),
                       encoder_widths=(64, 64, 64, 128),
                       decoder_widths=(32, 32, 64, 128),
                       out_conv=(32, cfg.get("num_classes", 15) if
                                 cfg.get("out_conv") is None else
                                 tuple(cfg["out_conv"])[-1]),
                       temporal="lstm", hidden_dim=64,
                       encoder_norm="group", padding_mode="zeros",
                       pad_value=0.0, dtype=cfg.get("dtype", None))
    if name == "unet_naive":
        from crop2seg_tpu.models.unet import UnetNaive
        if cfg.get("max_temp") is None:
            raise ValueError("unet_naive requires --max_temp "
                             "(reference train.py:57-59)")
        return UnetNaive(input_dim=cfg.get("input_dim", 10),
                         temporal_length=cfg["max_temp"],
                         out_conv=tuple(cfg.get("out_conv", (32, 15))),
                         pad_value=cfg.get("pad_value", 0.0),
                         dtype=cfg.get("dtype", None))
    raise ValueError(f"unknown model {name!r}")
