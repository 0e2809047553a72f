"""imagine360_tpu — a TPU-native perspective-to-360° panoramic video generation framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of 3DTopia/Imagine360
(reference: /root/reference), designed TPU-first:

- geometry: pure-function equirectangular<->perspective projection built on XLA
  gathers (reference used kornia remap / cv2.remap, see
  reference src/utils/Perspective_and_Equirectangular/{e2p,p2e}.py)
- models: dual-branch AnimateDiff-style 3D UNet pair coupled by panorama-aware
  cross attention (reference src/models/MVGenModel.py), written as Flax modules
  with fused attention kernels
- diffusion: DDIM v-prediction sampler with zero-terminal-SNR rescale as pure
  functions scanned under jit (reference diffusers/schedulers/scheduling_ddim.py)
- parallel: jax.sharding mesh over (view/frame) axes with XLA collectives over
  ICI; no torch.distributed analogue is needed
"""

__version__ = "0.1.0"
