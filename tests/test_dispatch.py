"""Kernel-dispatch consolidation (VERDICT r4 item 6): the production
attention shapes must select their expected kernels, the config must be
overridable without process state leaks, and unknown switches must raise.

Shapes below are the real denoise-step sites at the production geometry
(frames=16, CFG batch 2, 20 views, SD2.1 heads (5,10,20,20) / dim_head 64,
WarpAttn heads dim//32 / dim_head 32 — imagine360_tpu/presets.py,
models/warp.py)."""
import pytest

from imagine360_tpu.ops.dispatch import (KernelConfig, configure,
                                         kernel_config,
                                         select_attention_route)


def route(B, Sq, Sk, H, D, bias=False, bcast=False, cfg=None, on_tpu=True):
    return select_attention_route(B, Sq, Sk, H, D, bias, bcast, on_tpu,
                                  cfg=cfg)


# (label, shape args, expected route on TPU at default config)
PRODUCTION_SITES = [
    # pers spatial self-attn, stage 0..3 (folded B = 2 CFG x 20 views x 16f)
    ("pers_spatial_s0", (640, 1024, 1024, 5, 64), "single"),
    ("pers_spatial_s1", (640, 256, 256, 10, 64), "single"),
    ("pers_spatial_s2", (640, 64, 64, 20, 64), "single"),
    # pano spatial self-attn (B = 2 CFG x 16 frames)
    ("pano_spatial_s0", (32, 8192, 8192, 5, 64), "mh_flash"),
    ("pano_spatial_s1", (32, 2048, 2048, 10, 64), "mh_flash"),
    ("pano_spatial_s2", (32, 512, 512, 20, 64), "single"),
    ("pano_spatial_s3", (32, 128, 128, 20, 64), "single"),
    # text/ip cross-attn (Sk = 77 text + 64 ip tokens)
    ("pers_text_cross", (640, 1024, 141, 5, 64), "single"),
    ("pano_text_cross", (32, 8192, 141, 5, 64), "mh_flash"),
    # motion-module frame attention shape class (packed tiny-seq)
    ("motion_tiny_seq", (40960, 16, 16, 8, 40), "packed"),
]

WARP_SITES = [
    # WarpAttn: broadcast [1,1,Sq,Sk] mask bias; B=2x16, H=dim/32
    ("warp_s2_pano_q", (32, 2048, 5120, 10, 32), "shared_bias"),
    ("warp_s2_pers_q", (32, 5120, 2048, 10, 32), "shared_bias"),
    ("warp_s4_pano_q", (32, 512, 1280, 20, 32), "shared_bias"),
    # deepest site: tokens too few for the flash kernels; the 40-head
    # f32 logits exceed the 128 MB materialization cap -> chunked einsum
    ("warp_s8_pano_q", (32, 128, 320, 40, 32), "chunked"),
    ("warp_s8_pers_q", (32, 320, 128, 40, 32), "chunked"),
]


@pytest.mark.parametrize("label,shape,expect",
                         PRODUCTION_SITES, ids=[s[0] for s in PRODUCTION_SITES])
def test_production_no_bias_routes(label, shape, expect):
    assert route(*shape) == expect


@pytest.mark.parametrize("label,shape,expect",
                         WARP_SITES, ids=[s[0] for s in WARP_SITES])
def test_production_warp_routes(label, shape, expect):
    assert route(*shape, bias=True, bcast=True) == expect


def test_cpu_routes_never_pallas():
    for _, shape, _ in PRODUCTION_SITES + WARP_SITES:
        assert route(*shape, on_tpu=False) in ("einsum", "chunked")


def test_disable_pallas_master_switch():
    cfg = KernelConfig(pallas=False)
    assert route(640, 1024, 1024, 5, 64, cfg=cfg) in ("einsum", "chunked")


def test_mh_flash_off_falls_to_flash():
    cfg = KernelConfig(mh_flash=False)
    assert route(32, 8192, 8192, 5, 64, cfg=cfg) == "flash"
    # long-query/short-kv pano cross site falls to the XLA path
    assert route(32, 8192, 141, 5, 64, cfg=cfg) in ("einsum", "chunked")


def test_einsum_bwd_preempts_mh_flash():
    """ADVICE r4 (medium): the einsum-backward debug path must be reachable
    without also disabling mh_flash."""
    cfg = KernelConfig(einsum_bwd=True)
    assert route(32, 8192, 8192, 5, 64, cfg=cfg) == "flash_einsum_bwd"


def test_shared_bias_off_falls_to_flash():
    cfg = KernelConfig(shared_bias=False)
    assert route(32, 2048, 5120, 10, 32, bias=True, bcast=True,
                 cfg=cfg) == "flash"


def test_configure_restores_and_rejects_unknown():
    base = kernel_config()
    with configure(mh_flash=False) as cfg:
        assert cfg.mh_flash is False
        assert kernel_config().mh_flash is False
    assert kernel_config() == base
    with pytest.raises(ValueError, match="unknown kernel switch"):
        with configure(definitely_not_a_switch=True):
            pass


def test_env_parse(monkeypatch):
    from imagine360_tpu.ops import dispatch
    monkeypatch.setenv("I360_KERNELS", "-mh_flash, +pallas_dense ,attn_v2")
    dispatch.reset_kernel_config()
    try:
        cfg = kernel_config()
        assert (cfg.mh_flash, cfg.pallas_dense, cfg.attn_v2) == \
            (False, True, True)
        monkeypatch.setenv("I360_KERNELS", "bogus_switch")
        dispatch.reset_kernel_config()
        with pytest.raises(ValueError, match="bogus_switch"):
            kernel_config()
    finally:
        monkeypatch.delenv("I360_KERNELS")
        dispatch.reset_kernel_config()
