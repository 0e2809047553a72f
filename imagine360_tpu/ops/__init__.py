from .attention import dot_product_attention
from .blur import gaussian_blur_5x5
