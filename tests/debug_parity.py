"""Dev bisection: compare intermediate activations torch-vs-jax."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import conftest  # noqa: F401
import refshim

refshim.install()

import jax
import jax.numpy as jnp
import numpy as np
import torch

from test_golden_unet import TINY_TORCH_KWARGS, _tiny_jax_config
from animatediff.models.unet import UNet3DConditionModel as TorchUNet
from imagine360_tpu.models.unet3d import UNet3DConditionModel
from imagine360_tpu.utils.convert import convert_state_dict, apply_converted

torch.manual_seed(0)
tm = TorchUNet(**TINY_TORCH_KWARGS)
tm.eval()
from test_golden_unet import enable_stub_xformers
enable_stub_xformers(tm)

B, F, H, W = 1, 2, 16, 32
rng = np.random.default_rng(0)
sample = rng.normal(size=(B, 9, F, H, W)).astype(np.float32)
text = rng.normal(size=(B, 7, 32)).astype(np.float32)
ref_feats = rng.normal(size=(B, 16, 16, 8)).astype(np.float32)
t = np.array([500], np.int64)
fps = np.array([8], np.int64)

# capture torch intermediates
caps = {}


def hook(name):
    def fn(mod, inp, out):
        o = out
        if hasattr(o, "sample"):
            o = o.sample
        if isinstance(o, tuple):
            o = o[0]
        caps[name] = o.detach().numpy()
    return fn


tm.conv_in.register_forward_hook(hook("conv_in"))
tm.time_embedding.register_forward_hook(hook("time_embedding"))
tm.fps_embedding.register_forward_hook(hook("fps_embedding"))
tm.temporal_proj.register_forward_hook(hook("temporal_proj"))
tm.image_proj_model.register_forward_hook(hook("image_proj_model"))
tm.down_blocks[0].resnets[0].register_forward_hook(hook("d0r0"))
tm.down_blocks[0].attentions[0].register_forward_hook(hook("d0a0"))
tm.down_blocks[0].motion_modules[0].register_forward_hook(hook("d0m0"))
tm.down_blocks[0].register_forward_hook(hook("d0"))
tb = tm.down_blocks[0].attentions[0]
tb.norm.register_forward_hook(hook("a0.norm"))
tb.proj_in.register_forward_hook(hook("a0.proj_in"))
tb.transformer_blocks[0].attn1.register_forward_hook(hook("a0.attn1"))
tb.transformer_blocks[0].attn2.register_forward_hook(hook("a0.attn2"))
tb.transformer_blocks[0].ff.register_forward_hook(hook("a0.ff"))
tb.transformer_blocks[0].norm1.register_forward_hook(hook("a0.norm1"))
tm.down_blocks[3].register_forward_hook(hook("d3"))
tm.mid_block.register_forward_hook(hook("mid"))
tm.up_blocks[0].register_forward_hook(hook("u0"))
tm.up_blocks[3].register_forward_hook(hook("u3"))

with torch.no_grad():
    out_t = tm(torch.from_numpy(sample), torch.from_numpy(t),
               torch.from_numpy(text),
               use_ip_plus_cross_attention=True,
               reference_images_clip_feat=torch.from_numpy(ref_feats),
               use_fps_condition=True,
               fps_tensor=torch.from_numpy(fps)).sample.numpy()

cfg = _tiny_jax_config()
model = UNet3DConditionModel(cfg)
x = jnp.asarray(np.transpose(sample, (0, 2, 3, 4, 1)))
params = model.init(jax.random.PRNGKey(0), x, jnp.asarray(t, jnp.float32),
                    jnp.asarray(text), jnp.asarray(fps, jnp.float32),
                    jnp.asarray(ref_feats))
flat = convert_state_dict(tm.state_dict())
params, missing, unexpected = apply_converted(params, flat)


def cmp(name, mine_bfhwc, torch_key, to_torch=True):
    theirs = caps[torch_key]
    mine = np.asarray(mine_bfhwc)
    if to_torch and mine.ndim == 5:
        mine = np.transpose(mine, (0, 4, 1, 2, 3))
    err = np.abs(mine - theirs)
    print(f"{name:20s} maxerr {err.max():.3e}  shape {mine.shape}")


# stage-by-stage jax
def run(method, *args, **kw):
    return model.apply(params, *args, method=method, **kw)


temb = run(model.time_embed, jnp.asarray(t, jnp.float32),
           jnp.asarray(fps, jnp.float32))
print("temb jax computed")
# torch emb = time_embedding + fps_embedding; compare sum indirectly
emb_t = caps["time_embedding"] + caps["fps_embedding"]
print(f"{'temb':20s} maxerr {np.abs(np.asarray(temb) - emb_t).max():.3e}")

ip = run(model.ip_tokens, jnp.asarray(ref_feats))
cmp("ip_tokens", ip, "image_proj_model", to_torch=False)

h = run(model.stem, x)
cmp("conv_in", h, "conv_in")

ctx = run(model.build_context, jnp.asarray(text), ip)

# walk down block 0 manually via apply with bound module
def down0(mdl, h, temb, ctx):
    return mdl.down_blocks[0](h, temb, ctx)


hr = model.apply(params, h, temb,
                 method=lambda m, a, b: m.down_blocks[0].resnets[0](a, b))
cmp("d0.resnet0", hr, "d0r0")
ha_ = model.apply(params, jnp.asarray(np.transpose(caps["d0r0"],
                                                   (0, 2, 3, 4, 1))), ctx,
                  method=lambda m, a, c: m.down_blocks[0].attentions[0](a, c))
cmp("d0.attn0(t-in)", ha_, "d0a0")
hm_ = model.apply(params, jnp.asarray(np.transpose(caps["d0a0"],
                                                   (0, 2, 3, 4, 1))),
                  method=lambda m, a: m.down_blocks[0].motion_modules[0](a))
cmp("d0.motion0(t-in)", hm_, "d0m0")

h0, skips0 = model.apply(params, h, temb, ctx,
                         method=lambda m, a, b, c: m.down_blocks[0](a, b, c))
cmp("down0", h0, "d0")

h3 = model.apply(params, h0, temb, ctx,
                 method=lambda m, a, b, c: m.down_blocks[1](a, b, c))[0]
h3b = model.apply(params, h3, temb, ctx,
                  method=lambda m, a, b, c: m.down_blocks[2](a, b, c))[0]
h3c = model.apply(params, h3b, temb, ctx,
                  method=lambda m, a, b, c: m.down_blocks[3](a, b, c))[0]
cmp("down3", h3c, "d3")

hm = model.apply(params, h3c, temb, ctx,
                 method=lambda m, a, b, c: m.mid_block(a, b, c))
cmp("mid", hm, "mid")

out_j = model.apply(params, x, jnp.asarray(t, jnp.float32),
                    jnp.asarray(text), jnp.asarray(fps, jnp.float32),
                    jnp.asarray(ref_feats))
print(f"{'final':20s} maxerr "
      f"{np.abs(np.transpose(np.asarray(out_j), (0,4,1,2,3)) - out_t).max():.3e}")
