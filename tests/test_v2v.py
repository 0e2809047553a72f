"""Structural tests for the VEnhancer ControlledV2VUNet port
(imagine360_tpu/sr/unet_v2v.py; VERDICT r2 missing item 1).

The real unet_v2v module + weights live outside the reference snapshot
(reference sr/video_to_video_model.py:12,41 imports them from the external
VEnhancer repo), so parity here is structural: shapes, the ControlNet
zero-init identity, hint scattering semantics, and the converter name map
against a synthetic torch-layout state_dict. Golden numerics are deferred
until real weights exist.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flax.traverse_util import flatten_dict

from imagine360_tpu.sr.unet_v2v import (ControlledV2VUNet, Vid2VidSDUNet,
                                        V2VRefiner, convert_v2v,
                                        scatter_hint, tiny_v2v_config)

B, F, H, W = 1, 4, 8, 16
CFG = tiny_v2v_config()


@pytest.fixture(scope="module")
def model_and_params():
    model = ControlledV2VUNet(CFG)
    x = jnp.zeros((B, F, H, W, CFG.in_dim), jnp.float32)
    hint = jnp.zeros_like(x)
    ctx = jnp.zeros((B, 7, CFG.context_dim), jnp.float32)
    t = jnp.full((B,), 500.0)
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, hint,
                        t_hint=jnp.full((B,), 199.0),
                        mask_cond=jnp.ones((B, F)),
                        s_cond=jnp.full((B,), 2.0))
    # the zero_module convs (out_conv, resblock out convs, proj_out) make
    # the whole net output zeros at init — fill the BASE UNet's zero leaves
    # with small noise so forward outputs are non-trivial, while the
    # ControlNet's zero convs/linears stay zero (the identity under test)
    rng = np.random.default_rng(99)
    params = dict(params)
    params["params"] = dict(params["params"])
    params["params"]["unet"] = jax.tree.map(
        lambda a: (jnp.asarray(rng.normal(size=a.shape) * 0.05, a.dtype)
                   if float(jnp.abs(a).sum()) == 0.0 else a),
        params["params"]["unet"])
    return model, params


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, F, H, W, CFG.in_dim)), jnp.float32)
    hint = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, 7, CFG.context_dim)), jnp.float32)
    out = model.apply(params, x, jnp.full((B,), 500.0), ctx, hint,
                      t_hint=jnp.full((B,), 199.0),
                      mask_cond=jnp.ones((B, F)),
                      s_cond=jnp.full((B,), 2.0))
    assert out.shape == (B, F, H, W, CFG.out_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_controlnet_residuals_zero_at_init(model_and_params):
    """Every ControlNet output passes a zero-init conv, so at init the
    controlled UNet must equal the base UNet on the same params — the
    ControlNet identity that makes fine-tuning stable."""
    model, params = model_and_params
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, F, H, W, CFG.in_dim)), jnp.float32)
    hint = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, 7, CFG.context_dim)), jnp.float32)
    t = jnp.full((B,), 500.0)
    controlled = model.apply(params, x, t, ctx, hint,
                             t_hint=jnp.full((B,), 199.0),
                             mask_cond=jnp.ones((B, F)),
                             s_cond=jnp.full((B,), 2.0))
    base = Vid2VidSDUNet(CFG)
    base_out = base.apply({"params": params["params"]["unet"]}, x, t, ctx)
    np.testing.assert_allclose(np.asarray(controlled), np.asarray(base_out),
                               atol=1e-6)


def test_hint_embedding_gated_by_mask(model_and_params):
    """t_hint conditioning flows through hint_time_zero_linear (zero at
    init) — after perturbing that linear, key frames and non-key frames
    must diverge."""
    model, params = model_and_params
    # bring the whole ControlNet path live (zero convs AND the hint-time
    # zero linear), so mask_cond gating is observable at the output
    rng0 = np.random.default_rng(7)
    p = dict(params)
    p["params"] = dict(params["params"])
    p["params"]["controlnet"] = jax.tree.map(
        lambda a: (jnp.asarray(rng0.normal(size=a.shape) * 0.05, a.dtype)
                   if float(jnp.abs(a).sum()) == 0.0 else a),
        params["params"]["controlnet"])
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, F, H, W, CFG.in_dim)), jnp.float32)
    hint = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, 7, CFG.context_dim)), jnp.float32)
    t = jnp.full((B,), 500.0)
    kw = dict(t_hint=jnp.full((B,), 199.0), s_cond=jnp.full((B,), 2.0))
    out_all = model.apply(p, x, t, ctx, hint,
                          mask_cond=jnp.ones((B, F)), **kw)
    out_none = model.apply(p, x, t, ctx, hint,
                           mask_cond=jnp.zeros((B, F)), **kw)
    assert not np.allclose(np.asarray(out_all), np.asarray(out_none))


def test_scatter_hint():
    low = jnp.asarray(np.arange(2 * 2 * 3 * 4).reshape(1, 2, 2, 3, 4),
                      jnp.float32)
    hint, mask = scatter_hint(low, frames=6, interp_f_num=2)
    assert hint.shape == (1, 6, 2, 3, 4)
    np.testing.assert_array_equal(np.asarray(mask),
                                  [[1, 0, 0, 1, 0, 0]])
    np.testing.assert_array_equal(np.asarray(hint[:, 0]), np.asarray(low[:, 0]))
    np.testing.assert_array_equal(np.asarray(hint[:, 3]), np.asarray(low[:, 1]))
    assert float(jnp.abs(hint[:, 1]).sum()) == 0.0


def _torch_names_for(flat):
    """Build a synthetic torch-layout state_dict covering representative
    modules of the tiny config, with shapes derived from the flax params."""
    sd = {}

    def conv_t(k):          # HWIO -> OIHW
        return np.transpose(np.asarray(flat[k]), (3, 2, 0, 1))

    def conv3_t(k):         # DHWIO -> OIDHW
        return np.transpose(np.asarray(flat[k]), (4, 3, 0, 1, 2))

    def dense_t(k):
        return np.asarray(flat[k]).T

    raw = lambda k: np.asarray(flat[k])  # noqa: E731

    u = "unet."
    sd["time_embed.0.weight"] = dense_t(u + "time_embed_0.kernel")
    sd["time_embed.0.bias"] = raw(u + "time_embed_0.bias")
    sd["time_embed.2.weight"] = dense_t(u + "time_embed_2.kernel")
    sd["time_embed.2.bias"] = raw(u + "time_embed_2.bias")
    # encoder block 0: conv + temporal transformer
    sd["input_blocks.0.0.weight"] = conv_t(u + "enc.input_0_conv.kernel")
    sd["input_blocks.0.0.bias"] = raw(u + "enc.input_0_conv.bias")
    sd["input_blocks.0.1.norm.weight"] = raw(
        u + "enc.input_0_tempattn.norm.norm.scale")
    sd["input_blocks.0.1.proj_in.weight"] = dense_t(
        u + "enc.input_0_tempattn.proj_in.kernel")
    sd["input_blocks.0.1.transformer_blocks.0.attn1.to_q.weight"] = dense_t(
        u + "enc.input_0_tempattn.block_0.attn1.to_q.kernel")
    sd["input_blocks.0.1.transformer_blocks.0.ff.net.0.proj.weight"] = \
        dense_t(u + "enc.input_0_tempattn.block_0.ff.net_0_proj.kernel")
    # encoder block 1: ResBlock (+ attn at scale 1)
    sd["input_blocks.1.0.in_layers.0.weight"] = raw(
        u + "enc.input_1_res.in_norm.norm.scale")
    sd["input_blocks.1.0.in_layers.2.weight"] = conv_t(
        u + "enc.input_1_res.in_conv.kernel")
    sd["input_blocks.1.0.emb_layers.1.weight"] = dense_t(
        u + "enc.input_1_res.emb_proj.kernel")
    sd["input_blocks.1.0.out_layers.3.weight"] = conv_t(
        u + "enc.input_1_res.out_conv.kernel")
    sd["input_blocks.1.0.temopral_conv.conv1.0.weight"] = raw(
        u + "enc.input_1_res.temporal_conv.norm1.norm.scale")
    sd["input_blocks.1.0.temopral_conv.conv1.2.weight"] = conv3_t(
        u + "enc.input_1_res.temporal_conv.conv1.kernel")
    sd["input_blocks.1.1.transformer_blocks.0.attn2.to_out.0.weight"] = \
        dense_t(u + "enc.input_1_attn.block_0.attn2.to_out_0.kernel")
    # middle + out
    sd["middle_block.0.in_layers.2.weight"] = conv_t(
        u + "enc.middle_res0.in_conv.kernel")
    sd["middle_block.1.proj_out.weight"] = dense_t(
        u + "enc.middle_attn.proj_out.kernel")
    sd["middle_block.3.skip_connection.weight"] = conv_t(
        u + "enc.middle_res1.skip.kernel") \
        if u + "enc.middle_res1.skip.kernel" in flat else None
    if sd["middle_block.3.skip_connection.weight"] is None:
        del sd["middle_block.3.skip_connection.weight"]
    sd["out.0.weight"] = raw(u + "out_norm.norm.scale")
    sd["out.2.weight"] = conv_t(u + "out_conv.kernel")
    # decoder block 0 res + upsample (tiny cfg: 2 levels -> upsample at
    # end of level 0, i.e. output block num_res_blocks)
    sd["output_blocks.0.0.in_layers.2.weight"] = conv_t(
        u + "output_0_res.in_conv.kernel")
    # upsample sits at inner index 3 of its block (res, attn, tempattn, up)
    nup = CFG.num_res_blocks
    sd[f"output_blocks.{nup}.3.conv.weight"] = conv_t(
        u + f"output_{nup}_upsample.conv.kernel")
    # controlnet bits
    c = "controlnet."
    sd["VideoControlNet.time_embed.0.weight"] = dense_t(
        c + "time_embed_0.kernel")
    sd["VideoControlNet.hint_time_zero_linear.weight"] = dense_t(
        c + "hint_time_zero_linear.kernel")
    sd["VideoControlNet.input_blocks.0.0.weight"] = conv_t(
        c + "enc.input_0_conv.kernel")
    sd["VideoControlNet.zero_convs.0.0.weight"] = conv_t(
        c + "zero_conv_0.kernel")
    sd["VideoControlNet.middle_block_out.0.weight"] = conv_t(
        c + "middle_block_out.kernel")
    return sd


def test_converter_maps_representative_keys(model_and_params):
    model, params = model_and_params
    flat = {".".join(k): v for k, v in
            flatten_dict(params["params"]).items()}
    sd = _torch_names_for(flat)
    conv = convert_v2v(sd, CFG)
    assert "_unmapped" not in conv, conv.get("_unmapped")
    for path, arr in conv.items():
        assert path in flat, f"converted path {path} not in param tree"
        assert arr.shape == tuple(flat[path].shape), path
        np.testing.assert_allclose(arr, np.asarray(flat[path]), atol=0)


def test_refiner_prepare_and_step(model_and_params):
    model, params = model_and_params
    ref = V2VRefiner(model, params, guidance_scale=1.0, interp_f_num=1)
    z = jnp.asarray(np.random.default_rng(3).normal(
        size=(F, H, W, 4)), jnp.float32)
    fn = ref.prepare(z)
    out = fn(z, jnp.full((1,), 500.0), jax.random.PRNGKey(0))
    assert out.shape == z.shape
    assert np.isfinite(np.asarray(out)).all()
