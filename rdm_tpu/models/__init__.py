from rdm_tpu.models.unet import UNet, UNetConfig

__all__ = ["UNet", "UNetConfig"]
