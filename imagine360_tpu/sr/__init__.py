from .tiled_decode import tiled_chunked_decode, gaussian_weights_2d
from .wavelet_fix import wavelet_color_fix
from .enhance import Video360Enhancer, EnhancerConfig
from .refiner import PanoRefiner, PanoRefinerConfig
from .unet_v2v import (ControlledV2VUNet, Vid2VidSDUNet, VideoControlNet,
                       V2VConfig, V2VRefiner, convert_v2v)
