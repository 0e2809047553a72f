from .tiled_decode import tiled_chunked_decode, gaussian_weights_2d
from .wavelet_fix import wavelet_color_fix
from .enhance import Video360Enhancer, EnhancerConfig
