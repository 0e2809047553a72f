from .sampler import SamplerConfig, DualDiffusionSampler
from .conditioning import (init_shared_noise, prepare_masked_latents,
                           downsample_mask_nearest)
