"""Model registry (reference: train_untils.py:22-130, create_models —
model construction half; the optimizer/criterion/schedule half lives in
adnm_tpu.train.presets).

All models share the forward contract
(B, T_in, 1, H, W) -> (B, T_out, 1, H, W) and are flax modules whose
__call__ takes (x, train: bool).
"""

from __future__ import annotations

from typing import Optional

from flax import linen as nn

MODEL_NAMES = (
    "ADNMUnet",
    "ConvLSTM",
    "TrajGRU",
    "LPTQPN",
    "TransUnet",
    "SmaATUnet",
    "SwinUnet",
)


def create_model(
    model_name: str,
    input_frames: int,
    output_frames: int,
    frame_interval: int,
    bn_axis_name: Optional[str] = None,
    img_size: int = 256,
    **model_kwargs,
) -> nn.Module:
    """``model_kwargs`` are forwarded to the ADNMUnet factory (e.g.
    ``refiner_remat=False`` skips the backward's recompute of the four
    full-resolution refiner mixers at an HBM cost; the default True
    fits larger batches — bench.py A/Bs both)."""
    if model_name == "ADNMUnet":
        from adnm_tpu.models.adnm_unet import create_adnm_unet

        return create_adnm_unet(
            input_frames, output_frames, frame_interval, img_size=img_size, **model_kwargs
        )
    if model_kwargs:
        raise ValueError(
            f"model kwargs {sorted(model_kwargs)} are only supported for ADNMUnet"
        )
    if model_name == "SmaATUnet":
        from adnm_tpu.models.smaat_unet import SmaAtUNet

        return SmaAtUNet(n_channels=input_frames, n_classes=output_frames, bn_axis_name=bn_axis_name)
    if model_name == "ConvLSTM":
        from adnm_tpu.models.conv_lstm import create_conv_lstm

        return create_conv_lstm(output_frames)
    if model_name == "TrajGRU":
        from adnm_tpu.models.traj_gru import create_traj_gru

        return create_traj_gru(output_frames)
    if model_name == "LPTQPN":
        from adnm_tpu.models.lptqpn import LPTQPN

        return LPTQPN(inp_channels=input_frames, out_channels=output_frames)
    if model_name == "TransUnet":
        from adnm_tpu.models.trans_unet import create_trans_unet

        return create_trans_unet(output_frames, img_size=img_size, bn_axis_name=bn_axis_name)
    if model_name == "SwinUnet":
        from adnm_tpu.models.swin_unet import create_swin_unet

        return create_swin_unet(output_frames, img_size=img_size)
    raise ValueError(f"unknown model {model_name!r}; known: {MODEL_NAMES}")
