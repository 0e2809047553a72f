"""Core Flax building blocks shared by every model in the framework.

Layout conventions (TPU-first, channels-last):
- video features: [B, F, H, W, C]  (frames fold into the batch axis for all
  per-frame spatial ops; the reference's `b c f h w` torch layout exists only
  at the converter boundary)
- token sequences: [B, S, C]
- embeddings: [B, C]

Parameter names mirror the reference torch module names (to_q, to_k, net_0,
linear_1, ...) so the torch->jax checkpoint converter is a mechanical path
map + transpose (see utils/convert.py).
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention

Dtype = jnp.dtype


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embedding, matching diffusers get_timestep_embedding
    (reference diffusers/models/embeddings.py:26-67). timesteps [N] -> [N, dim].
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """linear_1 -> silu -> linear_2 (reference embeddings.py:190-236)."""
    time_embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


class InflatedConv(nn.Module):
    """2D conv applied per frame to [B, F, H, W, C] video tensors
    (reference animatediff/models/resnet.py:19-27 InflatedConv3d).

    Padding is explicit torch-style symmetric zero padding.
    """
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    kernel_init_zero: bool = False   # guided-diffusion zero_module convs
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        video = x.ndim == 5
        if video:
            B, F, H, W, C = x.shape
            x = x.reshape(B * F, H, W, C)
        k = self.kernel
        kernel = self.param(
            "kernel", nn.initializers.zeros if self.kernel_init_zero
            else nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features), jnp.float32)
        from ..ops.dispatch import kernel_config
        if (k == 1 and self.stride == 1 and self.padding == 0
                and kernel_config().conv1x1_matmul):
            # 1x1 conv as a flattened matmul: identical math, but the
            # conv form at stage-0 shapes gets the rotated-layout
            # batch-in-window emitter (~48 TF/s) inside the denoise scan
            # (r4 HLO: the up_blocks_3 conv_shortcuts), while the [N, C]
            # dot compiles to a clean MXU matmul
            N, Hs, Ws, C = x.shape
            y = jnp.dot(x.astype(self.dtype).reshape(N * Hs * Ws, C),
                        kernel[0, 0].astype(self.dtype))
            y = y.reshape(N, Hs, Ws, self.features)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(self.padding, self.padding)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        if video:
            y = y.reshape(B, F, y.shape[1], y.shape[2], y.shape[3])
        return y


import functools as _functools
import numpy as _np


@_functools.lru_cache(maxsize=32)
def _group_indicator(C: int, G: int):
    """[C, G] 0/1 matrix mapping channels to their group."""
    m = _np.zeros((C, G), _np.float32)
    cg = C // G
    for g in range(G):
        m[g * cg:(g + 1) * cg, g] = 1.0
    return m


def fast_group_norm(x, num_groups: int, epsilon: float, gamma, beta):
    """GroupNorm via matmul group-reductions.

    The textbook implementation (flax nn.GroupNorm, torch) reshapes
    [..., C] -> [..., G, C/G] and reduces the tiny trailing axis — on TPU
    that axis lands on the 128-wide lane dimension (C/G = 10 lanes for the
    SD UNet's 320/32 norms), padding 12.8x and wrecking every fusion it
    touches (measured: a Dense+residual epilogue goes 4.3 -> 39 ms when a
    naive GroupNorm joins the fusion; scripts/spatial_lab.py). Here group
    stats come from two [N, C] @ [C, G] matmuls (sum and sum-of-squares)
    and are expanded back with the transposed indicator — no reshapes, two
    streaming passes over x, everything MXU/VPU shaped.

    x: [N, ...spatial..., C]; stats per (n, group) over spatial x C/G.
    """
    from ..ops.dispatch import kernel_config
    N, C = x.shape[0], x.shape[-1]
    G = num_groups
    xf = x.reshape(N, -1, C)
    ind = jnp.asarray(_group_indicator(C, G))
    x32 = xf.astype(jnp.float32)
    if kernel_config().gn_mmstats:
        # token reduction as an MXU matmul with a ones vector: the plain
        # jnp.sum over the token axis biases XLA's layout assignment
        # toward token-minor activation layouts inside the full model,
        # which poisons neighboring matmuls into window=B correlation
        # lowerings (see STATUS.md / scripts/dense3d_lab.py)
        ones = jnp.ones((xf.shape[1], 8), jnp.float32)
        hi2 = jax.lax.Precision.HIGHEST
        s1 = jnp.einsum("nsc,sk->nck", x32, ones, precision=hi2)[..., 0]
        s2 = jnp.einsum("nsc,sk->nck", jnp.square(x32), ones,
                        precision=hi2)[..., 0]
    else:
        s1 = jnp.sum(x32, axis=1)                          # [N, C]
        s2 = jnp.sum(jnp.square(x32), axis=1)              # [N, C]
    cnt = xf.shape[1] * (C // G)
    # the group reductions/expansions are tiny [N,C]@[C,G] matmuls; run
    # them at full f32 precision (the bf16 MXU default costs ~1e-2 error)
    hi = jax.lax.Precision.HIGHEST
    mu = jnp.matmul(s1, ind, precision=hi) / cnt           # [N, G]
    var = jnp.matmul(s2, ind, precision=hi) / cnt - jnp.square(mu)
    a = jax.lax.rsqrt(var + epsilon)                       # [N, G]
    a_c = jnp.matmul(a, ind.T, precision=hi)               # [N, C]
    mu_c = jnp.matmul(mu, ind.T, precision=hi)
    gamma32 = gamma.astype(jnp.float32)
    scale = a_c * gamma32
    shift = beta.astype(jnp.float32) - mu_c * scale
    y = x32 * scale[:, None, :] + shift[:, None, :]
    return y.astype(x.dtype).reshape(x.shape)


class GroupNorm(nn.Module):
    """GroupNorm over [B, F, H, W, C]. inflated=True normalizes each frame
    independently (reference InflatedGroupNorm, resnet.py:9-17); otherwise
    statistics span frames too (plain torch GroupNorm on b c f h w).

    Uses the matmul-reduction implementation (fast_group_norm) — numerics
    match flax/torch GroupNorm; parameter tree is unchanged
    ({norm: {scale, bias}})."""
    num_groups: int = 32
    epsilon: float = 1e-5
    inflated: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        norm = _FastGN(self.num_groups, self.epsilon, name="norm")
        video = x.ndim == 5
        if video and self.inflated:
            B, F, H, W, C = x.shape
            return norm(x.reshape(B * F, H, W, C)).reshape(x.shape)
        return norm(x)


class _FastGN(nn.Module):
    """Parameter-compatible stand-in for nn.GroupNorm (scale/bias under the
    same names) running fast_group_norm."""
    num_groups: int
    epsilon: float

    @nn.compact
    def __call__(self, x):
        from ..ops.dispatch import kernel_config
        C = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        spatial = 1
        for d in x.shape[1:-1]:
            spatial *= d
        # regime split (measured, v5e): the matmul-reduction path wins for
        # many-row/moderate-spatial UNet shapes (3.4 -> 2.6 ms at r1); the
        # flax reshape path wins for few-row/huge-spatial VAE decode shapes
        # (10.1 vs 12.1 s full decode)
        if kernel_config().flax_gn or spatial > 16384:
            h = nn.GroupNorm(num_groups=self.num_groups,
                             epsilon=self.epsilon, use_bias=False,
                             use_scale=False)(x)
            return h * gamma.astype(h.dtype) + beta.astype(h.dtype)
        return fast_group_norm(x, self.num_groups, self.epsilon, gamma, beta)


class Attention(nn.Module):
    """Multi-head (cross-)attention matching diffusers' Attention semantics
    (no qkv bias, output projection with bias). Accepts an additive bias
    broadcastable to [B, H, Sq, Sk]."""
    query_dim: int
    heads: int
    dim_head: int
    out_bias: bool = True
    out_zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, bias=None, bias_t=None):
        if context is None:
            context = x
        inner = self.heads * self.dim_head
        q = flat2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="to_q"), x)
        k = flat2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="to_k"), context)
        v = flat2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="to_v"), context)
        B, Sq = q.shape[0], q.shape[1]
        Sk = k.shape[1]
        q = q.reshape(B, Sq, self.heads, self.dim_head)
        k = k.reshape(B, Sk, self.heads, self.dim_head)
        v = v.reshape(B, Sk, self.heads, self.dim_head)
        out = dot_product_attention(q, k, v, bias=bias, bias_t=bias_t)
        out = out.reshape(B, Sq, inner)
        init = nn.initializers.zeros if self.out_zero_init \
            else nn.initializers.lecun_normal()
        return flat2d(nn.Dense(self.query_dim, use_bias=self.out_bias,
                               kernel_init=init, dtype=self.dtype,
                               name="to_out_0"), out)


class IPCrossAttention(nn.Module):
    """Text cross-attention + decoupled image-prompt K/V path
    (reference animatediff/models/attention.py:23-156 IPCrossAttention):
    out = attn(q, text) + scale * attn(q, ip) through a shared to_out."""
    query_dim: int
    heads: int
    dim_head: int
    scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, text_context, ip_context):
        inner = self.heads * self.dim_head
        q = flat2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="to_q"), x)
        k = flat2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="to_k"), text_context)
        v = flat2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="to_v"), text_context)
        k_ip = flat2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                               name="to_k_ip"), ip_context)
        v_ip = flat2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                               name="to_v_ip"), ip_context)

        B, Sq = q.shape[0], q.shape[1]
        qh = q.reshape(B, Sq, self.heads, self.dim_head)

        def attend(kk, vv):
            S = kk.shape[1]
            return dot_product_attention(
                qh,
                kk.reshape(B, S, self.heads, self.dim_head),
                vv.reshape(B, S, self.heads, self.dim_head),
            ).reshape(B, Sq, inner)

        out = attend(k, v) + self.scale * attend(k_ip, v_ip)
        return flat2d(nn.Dense(self.query_dim, dtype=self.dtype,
                               name="to_out_0"), out)


class MMDense(nn.Dense):
    """nn.Dense whose matmul runs through the pallas dense kernel on TPU.

    Countermeasure to the token-minor layout assignment that turns the
    transformer proj_in/proj_out dots inside the full dual model into
    window=B correlation lowerings at ~48 TF/s (STATUS.md; the pallas call
    pins row-major operands — see ops/pallas_dense.py). Param tree is
    byte-identical to nn.Dense, so checkpoints are unaffected.

    OPT-IN via KernelConfig.pallas_dense (I360_KERNELS=+pallas_dense),
    and measured NOT worth enabling: the in-model A/B on TPU v5e
    (tools/measure_step.py, 16-step CFG dual scan) gives 2.99 s/step ON
    vs 2.97 s/step OFF — XLA's in-context layout choice is not the
    pathology the standalone probes suggested, so the kernel buys nothing
    in-model. Default stays nn.Dense; the switch and kernel remain for
    layout experiments on other configs. Standalone the pallas kernel is
    ~par with XLA's dot (faster at 640x640, slower at 320x320 where the
    2.5-tile lane pad bites). Off-TPU and by default this IS nn.Dense.
    """

    @nn.compact
    def __call__(self, inputs):
        import numpy as np
        from ..ops.attention import _interpret, _on_tpu
        from ..ops.dispatch import kernel_config
        from ..parallel.mesh import current_mesh
        from ..ops.pallas_dense import dense_matmul, supported
        n = int(np.prod(inputs.shape[:-1]))
        # mesh-gated like ops/attention.py: an opaque pallas_call would
        # force GSPMD to replicate the sharded activations
        use = (kernel_config().pallas_dense
               and _on_tpu() and current_mesh() is None
               and supported(n, inputs.shape[-1], self.features))
        if not use:
            return super().__call__(inputs)
        kernel = self.param("kernel", self.kernel_init,
                            (inputs.shape[-1], self.features),
                            self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        inputs, kernel, bias = nn.dtypes.promote_dtype(
            inputs, kernel, bias, dtype=self.dtype)
        y = dense_matmul(inputs, kernel, interpret=_interpret())
        if bias is not None:
            y = y + bias
        return y


def flat2d(fn, x):
    """Apply a per-token fn on tokens flattened to [N, C].

    DEFAULT OFF (KernelConfig.flat_dense; opt in via
    I360_KERNELS=+flat_dense). History: r4 root-caused XLA lowering a
    [B, S, C] x [C, C'] dot_general inside lax.scan to a batch-in-window
    CONVOLUTION (window=B, dim_labels=fb0_0oi->0fb) at ~48 TF/s with
    rotated {1,2,0} output layouts — a 3x slowdown vs the same dot on
    [B*S, C] in a minimal repro. But the r5 full-model A/B (STATUS.md
    table) measured the flattening SLOWER in-model (3.50 vs 3.09 s/step
    with mh_flash+conv1x1 on): anchoring every projection row-major
    forces layout churn elsewhere that costs more than the few poisoned
    dots it repairs. Kept as an experiment switch."""
    from ..ops.dispatch import kernel_config
    if x.ndim <= 2 or not kernel_config().flat_dense:
        return fn(x)
    lead = x.shape[:-1]
    y = fn(x.reshape(-1, x.shape[-1]))
    return y.reshape(*lead, y.shape[-1])


def flat2d_proj(fn, x):
    """flat2d for the transformer/motion proj_in/proj_out sites ONLY
    (KernelConfig.flat_proj, default OFF). The r5 per-HLO profile shows
    exactly these dots lowering as ~48 TF/s batch-in-window convolutions
    with rotated layouts when left [B, S, C] (down_blocks_0/up_blocks_3
    attentions/motion proj sites, ~21 ms/step each) — yet the full-model
    A/B measured even this scoped anchoring net-SLOWER (3.376 vs 3.093
    s/step, STATUS.md): the row-major anchor's layout transitions cost
    more than the slow dots they repair. Kept as an experiment switch;
    the poisoned-dot accounting is documented so future XLA versions can
    be re-probed cheaply."""
    from ..ops.dispatch import kernel_config
    cfg = kernel_config()
    if x.ndim <= 2 or not (cfg.flat_proj or cfg.flat_dense):
        return fn(x)
    lead = x.shape[:-1]
    y = fn(x.reshape(-1, x.shape[-1]))
    return y.reshape(*lead, y.shape[-1])


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers FeedForward, activation_fn='geglu'):
    net_0.proj: Dense(dim -> 2*inner); out = x*gelu(gate); net_2: Dense(->dim).
    """
    dim: int
    mult: int = 4
    out_zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)

        def body(x):
            h = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * nn.gelu(gate, approximate=False)
            init = nn.initializers.zeros if self.out_zero_init \
                else nn.initializers.lecun_normal()
            return nn.Dense(self.dim, kernel_init=init, dtype=self.dtype,
                            name="net_2")(h)

        return flat2d(body, x)


class LayerNorm(nn.LayerNorm):
    """LayerNorm with torch's default epsilon (1e-5; flax defaults 1e-6)."""
    epsilon: float = 1e-5


def sinusoidal_position_table(max_len: int, d_model: int) -> jnp.ndarray:
    """The AnimateDiff temporal PositionalEncoding table
    (reference motion_module.py:262-280): pe[0, pos, 0::2]=sin, 1::2=cos."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                       * (-math.log(10000.0) / d_model))
    pe = jnp.zeros((max_len, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe
