"""SR CLI text-conditioning wiring (r5): prompt encoding config guards and
the refiners' text plumbing — the unit layer under the OpenCLIP golden
(tests/test_openclip_text.py)."""
import types

import jax.numpy as jnp
import numpy as np
import pytest


def _args(**kw):
    d = dict(prompt=None, neg_prompt="", text_ckpt=None, tokenizer_dir=None)
    d.update(kw)
    return types.SimpleNamespace(**d)


def test_no_prompt_is_unconditioned():
    from imagine360_tpu.sr.cli import _encode_sr_prompts
    assert _encode_sr_prompts(_args(), "float32") == (None, None)


def test_prompt_without_encoder_warns_and_falls_back():
    import logging
    from imagine360_tpu.sr import cli as sr_cli

    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = Capture()
    sr_cli.log.addHandler(h)   # the repo logger doesn't propagate to root
    try:
        out = sr_cli._encode_sr_prompts(_args(prompt="a dog"), "float32")
    finally:
        sr_cli.log.removeHandler(h)
    assert out == (None, None)
    assert any("running unconditioned" in m for m in records)


def test_pano_refiner_cfg_activates_with_text():
    """With distinct pos/neg embeddings and g != 1 the refiner runs the
    doubled CFG pass; with no text it runs single-pass (the r3 guard)."""
    from imagine360_tpu.presets import tiny_unet_config
    from imagine360_tpu.models.unet3d import UNet3DConditionModel
    from imagine360_tpu.sr.refiner import PanoRefiner, PanoRefinerConfig
    import jax

    ucfg = tiny_unet_config("float32")
    unet = UNet3DConditionModel(ucfg)
    F = 4
    params = unet.init(
        {"params": jax.random.PRNGKey(0), "ip_noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, F, 16, 32, 9)), jnp.zeros((1,)),
        jnp.zeros((1, 7, ucfg.cross_attention_dim)), jnp.zeros((1,)))
    D = ucfg.cross_attention_dim
    pos = jnp.ones((7, D)) * 0.1
    neg = jnp.zeros((7, D))
    r_text = PanoRefiner(unet, params, text_pos=pos, text_neg=neg,
                         cfg=PanoRefinerConfig(guidance_scale=7.5))
    r_plain = PanoRefiner(unet, params)
    z = jnp.zeros((F, 16, 32, 4))
    out_t = r_text(z, jnp.array([500.0]), None)
    out_p = r_plain(z, jnp.array([500.0]), None)
    assert out_t.shape == z.shape and out_p.shape == z.shape
    assert np.all(np.isfinite(np.asarray(out_t, np.float32)))
    # the CFG-active path conditions on real text; outputs must differ
    # from the unconditioned single-pass output
    assert not np.allclose(np.asarray(out_t, np.float32),
                           np.asarray(out_p, np.float32))


def test_route_logging_once_per_shape(caplog):
    """dispatch.log_route emits exactly one INFO line per unique shape
    signature (VERDICT r4 item 6: silent re-routes must be visible)."""
    import logging
    from imagine360_tpu.ops import dispatch
    dispatch._logged_routes.clear()
    with caplog.at_level(logging.INFO, logger="imagine360_tpu.dispatch"):
        dispatch.log_route("single", 640, 1024, 1024, 5, 64, False)
        dispatch.log_route("single", 640, 1024, 1024, 5, 64, False)
        dispatch.log_route("mh_flash", 32, 8192, 8192, 5, 64, False)
    lines = [r.message for r in caplog.records]
    assert len(lines) == 2
    assert any("single" in ln for ln in lines)
    assert any("mh_flash" in ln for ln in lines)
