"""Dev helper: report converter key mismatches without running forwards."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import conftest  # noqa: F401  (forces CPU)
import refshim

refshim.install()

import jax
import jax.numpy as jnp
import numpy as np
import torch

from test_golden_unet import TINY_TORCH_KWARGS, _tiny_jax_config
from animatediff.models.unet import UNet3DConditionModel as TorchUNet
from imagine360_tpu.models.unet3d import UNet3DConditionModel
from imagine360_tpu.utils.convert import convert_state_dict, flatten_params

torch.manual_seed(0)
tm = TorchUNet(**TINY_TORCH_KWARGS)
flat = convert_state_dict(tm.state_dict())

cfg = _tiny_jax_config()
model = UNet3DConditionModel(cfg)
B, F, H, W = 1, 2, 16, 32
params = jax.eval_shape(
    lambda: model.init(jax.random.PRNGKey(0),
                       jnp.zeros((B, F, H, W, 9)), jnp.zeros((B,)),
                       jnp.zeros((B, 7, 32)), jnp.zeros((B,)),
                       jnp.zeros((B, 16, 16, 8))))
from jax.tree_util import tree_flatten_with_path, keystr
leaves, _ = tree_flatten_with_path(params["params"])
init_flat = {".".join(str(getattr(kp, 'key', kp)) for kp in path): leaf.shape
             for path, leaf in leaves}

missing = sorted(k for k in init_flat if k not in flat)
unexpected = sorted(k for k in flat if k not in init_flat)
shape_bad = sorted(k for k in init_flat
                   if k in flat and tuple(flat[k].shape) != tuple(init_flat[k]))
print(f"missing ({len(missing)}):")
for k in missing[:20]:
    print("  ", k)
print(f"unexpected ({len(unexpected)}):")
for k in unexpected[:20]:
    print("  ", k)
print(f"shape mismatches ({len(shape_bad)}):")
for k in shape_bad[:20]:
    print("  ", k, flat[k].shape, init_flat[k])
