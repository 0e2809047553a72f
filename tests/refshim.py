"""Make the read-only reference repo importable on this machine (CPU torch).

The reference (/root/reference) vendors diffusers 0.11 and imports CUDA-era
deps (xformers, kornia, fairscale) that aren't installed here. This module
installs small behavior-faithful stubs + API shims so reference modules can
be imported and executed on CPU to produce golden values for parity tests.

Only tests import this; the framework itself never does.
"""
import os
import sys
import types

REF = "/root/reference"



def _mk_module(name):
    import importlib.machinery
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return m

def _shim_env():
    os.environ.setdefault("_CHECK_PEFT", "0")
    # keep the vendored diffusers torch-only: its flax schedulers use
    # dataclass array defaults that py3.12 rejects
    os.environ.setdefault("USE_FLAX", "0")
    os.environ.setdefault("USE_TORCH", "1")


def _shim_hf_hub():
    import huggingface_hub
    if not hasattr(huggingface_hub, "cached_download"):
        huggingface_hub.cached_download = huggingface_hub.hf_hub_download


def _shim_jax_keyarray():
    try:
        import jax
        if not hasattr(jax.random, "KeyArray"):
            jax.random.KeyArray = jax.Array
    except ImportError:
        pass


def _stub_xformers():
    """xformers.ops.memory_efficient_attention as plain torch attention.

    Semantics: q/k/v [B*H, S, D] (the reference reshapes heads into batch),
    attn_bias is an additive float mask broadcastable to [B*H, Sq, Sk].
    """
    if "xformers" in sys.modules:
        return
    import torch

    def memory_efficient_attention(q, k, v, attn_bias=None, p=0.0, scale=None):
        if scale is None:
            scale = q.shape[-1] ** -0.5
        logits = torch.einsum("bqd,bkd->bqk", q.float() * scale, k.float())
        if attn_bias is not None:
            logits = logits + attn_bias.float()
        probs = logits.softmax(dim=-1)
        return torch.einsum("bqk,bkd->bqd", probs, v.float()).to(q.dtype)

    import importlib.machinery
    xformers = _mk_module("xformers")
    ops = _mk_module("xformers.ops")
    ops.memory_efficient_attention = memory_efficient_attention
    xformers.ops = ops
    xformers.__version__ = "0.0.20"
    # importlib.util.find_spec("xformers") must succeed (import_utils.py:209)
    xformers.__spec__ = importlib.machinery.ModuleSpec("xformers", loader=None)
    ops.__spec__ = importlib.machinery.ModuleSpec("xformers.ops", loader=None)
    sys.modules["xformers"] = xformers
    sys.modules["xformers.ops"] = ops

    # importlib.metadata.version("xformers") must succeed for diffusers'
    # is_xformers_available() version check
    import importlib.metadata as _md
    _orig_version = _md.version

    def _version(name, *a, **kw):
        if name == "xformers":
            return "0.0.20"
        return _orig_version(name, *a, **kw)

    _md.version = _version


def _stub_kornia():
    """kornia pieces the reference uses: create_meshgrid, gaussian_blur2d,
    geometry.transform.remap (grid_sample align_corners semantics)."""
    if "kornia" in sys.modules:
        return
    import torch
    import torch.nn.functional as F

    def create_meshgrid(h, w, normalized_coordinates=True, device=None,
                        dtype=torch.float32):
        if normalized_coordinates:
            xs = torch.linspace(-1, 1, w, device=device, dtype=dtype)
            ys = torch.linspace(-1, 1, h, device=device, dtype=dtype)
        else:
            xs = torch.arange(w, device=device, dtype=dtype)
            ys = torch.arange(h, device=device, dtype=dtype)
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        return torch.stack([gx, gy], dim=-1)[None]  # [1, h, w, 2] (x, y)

    def _gaussian_kernel1d(ksize, sigma, dtype, device):
        x = torch.arange(ksize, dtype=dtype, device=device) - (ksize - 1) / 2
        k = torch.exp(-(x ** 2) / (2 * sigma ** 2))
        return k / k.sum()

    def gaussian_blur2d(x, kernel_size, sigma, border_type="reflect"):
        ky, kx = kernel_size
        sy, sx = (sigma if isinstance(sigma, (tuple, list)) else (sigma, sigma))
        kyv = _gaussian_kernel1d(ky, sy, x.dtype, x.device)
        kxv = _gaussian_kernel1d(kx, sx, x.dtype, x.device)
        kernel = torch.outer(kyv, kxv)[None, None]
        c = x.shape[1]
        pad = (kx // 2, kx // 2, ky // 2, ky // 2)
        mode = {"reflect": "reflect", "replicate": "replicate",
                "constant": "constant"}[border_type]
        xp = F.pad(x, pad, mode=mode)
        return F.conv2d(xp, kernel.expand(c, 1, ky, kx), groups=c)

    def remap(image, map_x, map_y, align_corners=True, mode="bilinear",
              padding_mode="zeros", normalized_coordinates=False):
        B, C, H, W = image.shape
        if map_x.ndim == 2:
            map_x = map_x[None]
            map_y = map_y[None]
        gx = 2 * map_x / (W - 1) - 1
        gy = 2 * map_y / (H - 1) - 1
        grid = torch.stack([gx, gy], dim=-1)
        if grid.shape[0] == 1 and B > 1:
            grid = grid.expand(B, -1, -1, -1)
        return F.grid_sample(image, grid.to(image.dtype), mode=mode,
                             padding_mode=padding_mode,
                             align_corners=align_corners)

    kornia = _mk_module("kornia")
    utils_m = _mk_module("kornia.utils")
    utils_m.create_meshgrid = create_meshgrid
    filters_m = _mk_module("kornia.filters")
    filters_m.gaussian_blur2d = gaussian_blur2d
    geometry_m = _mk_module("kornia.geometry")
    transform_m = _mk_module("kornia.geometry.transform")
    transform_m.remap = remap
    geometry_m.transform = transform_m
    kornia.utils = utils_m
    kornia.filters = filters_m
    kornia.geometry = geometry_m
    sys.modules.update({
        "kornia": kornia,
        "kornia.utils": utils_m,
        "kornia.filters": filters_m,
        "kornia.geometry": geometry_m,
        "kornia.geometry.transform": transform_m,
    })


def _stub_fairscale():
    if "fairscale" in sys.modules:
        return
    fairscale = _mk_module("fairscale")
    nn_m = _mk_module("fairscale.nn")
    ckpt_m = _mk_module("fairscale.nn.checkpoint")
    ckpt_m.checkpoint_wrapper = lambda module, **kw: module
    nn_m.checkpoint = ckpt_m
    fairscale.nn = nn_m
    sys.modules.update({
        "fairscale": fairscale,
        "fairscale.nn": nn_m,
        "fairscale.nn.checkpoint": ckpt_m,
    })


def _stub_torchvision():
    if "torchvision" in sys.modules:
        return
    try:
        import torchvision  # noqa: F401
        return
    except ImportError:
        pass
    tv = _mk_module("torchvision")
    transforms = _mk_module("torchvision.transforms")
    utils_m = _mk_module("torchvision.utils")
    utils_m.save_image = lambda *a, **k: None
    tv.transforms = transforms
    tv.utils = utils_m
    sys.modules.update({
        "torchvision": tv,
        "torchvision.transforms": transforms,
        "torchvision.utils": utils_m,
    })


_installed = False


def install():
    """Install all shims and put the reference repo on sys.path."""
    global _installed
    if _installed:
        return
    _shim_env()
    _shim_hf_hub()
    _shim_jax_keyarray()
    _stub_xformers()
    _stub_kornia()
    _stub_fairscale()
    _stub_torchvision()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _installed = True


def available() -> bool:
    return os.path.isdir(REF)
