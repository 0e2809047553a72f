"""Central kernel-dispatch configuration for every hot-path op.

One switchboard replaces the former per-site env flags (I360_NO_MH_FLASH,
I360_NO_FLAT_DENSE, I360_ATTN_V1/V2, ...): a frozen `KernelConfig` whose
defaults are the measured winners on TPU v5e (see STATUS.md for the A/B
table), overridable

- for experiments via ONE env var, `I360_KERNELS` — a comma list of
  fields, each prefixed `-` (disable) or `+`/bare (enable), e.g.
  `I360_KERNELS="-mh_flash,-flat_dense,+pallas_dense"`; unknown names
  raise immediately so typos cannot silently change the benchmark;
- for tests via the `configure(**fields)` context manager (no process
  state leaks — see tests/test_dispatch.py).

Route selection itself lives here too: `select_attention_route` is a PURE
function of the call shape + config, so the production dispatch matrix is
asserted by plain CPU tests (tests/test_dispatch.py) instead of being
implied by five interacting flags. `log_route` records each (shape ->
route) decision once per process at INFO, making silent re-routes visible
in bench/driver logs (VERDICT r4 weak #5).
"""
from __future__ import annotations

import contextlib
import dataclasses
import logging
import os
import threading

logger = logging.getLogger("imagine360_tpu.dispatch")


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    """Kernel/layout choices. Defaults = measured winners (STATUS.md)."""
    # master: False routes every site to the XLA reference paths
    pallas: bool = True
    # run pallas kernels in interpret mode (CPU tests of kernel paths)
    interpret: bool = False
    # packed tiny-sequence + single-block natural-layout kernels
    # (motion modules, spatial self-attn <=1024 tokens, text/ip cross)
    packed: bool = True
    # WarpAttn broadcast-bias kernel (transposed shared-bias flash)
    shared_bias: bool = True
    # natural-layout multi-head flash for no-bias long sequences
    mh_flash: bool = True
    # debug: einsum-reference backward instead of the streaming pallas bwd
    einsum_bwd: bool = False
    # kernel-variant forcing inside pallas_attention (perf experiments)
    attn_v1: bool = False
    attn_v2: bool = False
    # flatten [B, S, C] to [N, C] around every Dense (layers.flat2d).
    # DEFAULT OFF: measured SLOWER in the full model (r5 A/B table in
    # STATUS.md — 3.09 s/step off vs 3.50 on, with mh_flash+conv1x1; its
    # stage-0 micro-win does not compose)
    flat_dense: bool = False
    # flatten ONLY the transformer/motion proj_in/proj_out sites
    # (layers.flat2d_proj). The r5 per-HLO profile shows exactly these
    # lower as 48 TF/s batch-in-window convolutions when unflattened
    # (~210 ms/step at stage 0) — but the full-model A/B measured even
    # this SCOPED anchoring slower (config F 3.376 vs E 3.093 s/step):
    # the row-major anchor forces layout transitions around the sites
    # that cost more than the slow dots it repairs. The 48 TF/s
    # equilibrium is the cheaper one. DEFAULT OFF; kept for experiments.
    flat_proj: bool = False
    # lower 1x1 InflatedConv as a flattened matmul instead of a conv
    # (with mh_flash: 3.09 vs 3.30 s/step — r5 config E vs D)
    conv1x1_matmul: bool = True
    # MMDense pallas matmul (measured no-win in-model; kept for experiments)
    pallas_dense: bool = False
    # GroupNorm: matmul token-reduction stats / force flax reshape path
    gn_mmstats: bool = False
    flax_gn: bool = False


_FIELDS = {f.name for f in dataclasses.fields(KernelConfig)}
_lock = threading.Lock()
_active: KernelConfig | None = None


def _from_env() -> KernelConfig:
    spec = os.environ.get("I360_KERNELS", "")
    overrides: dict[str, bool] = {}
    for tok in filter(None, (t.strip() for t in spec.split(","))):
        val = not tok.startswith("-")
        name = tok.lstrip("+-")
        if name not in _FIELDS:
            raise ValueError(
                f"I360_KERNELS: unknown kernel switch {name!r} "
                f"(valid: {sorted(_FIELDS)})")
        overrides[name] = val
    cfg = KernelConfig(**overrides)
    if overrides:
        logger.info("kernel config overrides from I360_KERNELS: %s",
                    overrides)
    return cfg


def kernel_config() -> KernelConfig:
    """The active config (env-parsed once; context overrides win)."""
    global _active
    if _active is None:
        with _lock:
            if _active is None:
                _active = _from_env()
    return _active


def reset_kernel_config() -> None:
    """Drop the cached config so the next access re-reads I360_KERNELS."""
    global _active
    with _lock:
        _active = None


@contextlib.contextmanager
def configure(**fields: bool):
    """Temporarily override config fields (tests, A/B tools)."""
    global _active
    unknown = set(fields) - _FIELDS
    if unknown:
        raise ValueError(f"unknown kernel switch(es): {sorted(unknown)}")
    prev = kernel_config()
    with _lock:
        _active = dataclasses.replace(prev, **fields)
    try:
        yield _active
    finally:
        with _lock:
            _active = prev


# ---------------------------------------------------------------------------
# attention route selection (pure)
# ---------------------------------------------------------------------------

# don't materialize f32 logits beyond this under any backend
LOGITS_BYTES_LIMIT = 128 * 1024 * 1024
# single-block kernel applies when the [Sq, Skp] f32 logits fit VMEM
SINGLE_BLOCK_LOGITS = 1024 * 1024
# packed tiny-sequence attention: group into sequences of ~this many tokens
PACK_TARGET = 512


def pack_group(B: int, Sq: int, Sk: int) -> int:
    G = PACK_TARGET // max(Sq, Sk)
    while G > 1 and B % G:
        G //= 2
    return G


def select_attention_route(B: int, Sq: int, Sk: int, H: int, D: int,
                           has_bias: bool, bias_is_broadcast: bool,
                           on_tpu: bool,
                           cfg: KernelConfig | None = None) -> str:
    """Which kernel `dot_product_attention` runs for a (shape, bias) site
    on a single device (no active mesh). Returns one of:
    'packed' | 'single' | 'shared_bias' | 'mh_flash' | 'flash' |
    'flash_einsum_bwd' | 'chunked' | 'einsum'.

    Mirrors (and is consumed by) ops/attention.py:dot_product_attention;
    tests/test_dispatch.py pins the production shapes to their expected
    routes so dispatch regressions fail loudly instead of shifting step
    time.
    """
    cfg = cfg or kernel_config()
    on_tpu = on_tpu and cfg.pallas
    skp = -(-Sk // 128) * 128
    if (on_tpu and cfg.packed and not has_bias and Sq <= 64 and Sk <= 64
            and B >= 1024 and pack_group(B, Sq, Sk) >= 4):
        return "packed"
    if (on_tpu and cfg.packed and not has_bias and B >= 16 and Sq % 8 == 0
            and Sq * skp <= SINGLE_BLOCK_LOGITS):
        return "single"
    if (on_tpu and cfg.shared_bias and has_bias and bias_is_broadcast
            and Sq >= 256 and Sk >= 256 and (B * H) % 8 == 0):
        return "shared_bias"
    if (on_tpu and cfg.mh_flash and not cfg.einsum_bwd and not has_bias
            and Sq >= 256 and Sk >= 64 and D % 8 == 0):
        return "mh_flash"
    if on_tpu and Sq >= 256 and Sk >= 256:
        return "flash_einsum_bwd" if cfg.einsum_bwd else "flash"
    sq_pad = -(-Sq // 8) * 8
    if B * H * sq_pad * skp * 4 > LOGITS_BYTES_LIMIT:
        return "chunked"
    return "einsum"


_logged_routes: set[tuple] = set()


def log_route(route: str, B: int, Sq: int, Sk: int, H: int, D: int,
              has_bias: bool) -> None:
    """One INFO line per unique (shape signature -> route) per process."""
    key = (route, B, Sq, Sk, H, D, has_bias)
    if key in _logged_routes:
        return
    _logged_routes.add(key)
    logger.info("attention route %-16s B=%d Sq=%d Sk=%d H=%d D=%d bias=%s",
                route, B, Sq, Sk, H, D, has_bias)
