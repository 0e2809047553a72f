from .unet3d import UNet3DConfig, UNet3DConditionModel
from .dual import DualUNet, DualUNetConfig
