"""Validate bench.py's analytic ICI model against GSPMD's compiled HLO
(VERDICT r4 item 5).

Compiles ONE sharded CFG dual-UNet forward (the denoise-step body, no
scan) over the 8-virtual-device ('view',) mesh at the dryrun layout
(tiny channel widths, full 4-block depth, 20 views, all 7 WarpAttn
sites), then walks the optimized HLO and sums the output bytes of every
collective op. The same shapes are fed to bench._ici_comm_model; the two
numbers land side by side so the v5e-8 projection's comm term rests on
the partitioner's actual collective choices, not only a hand formula.

Run: python scripts/hlo_comm_bytes.py [--json /tmp/comm.json]
"""
import argparse
import json
import os
import re
import sys

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_disable_most_optimizations", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from imagine360_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from __graft_entry__ import _zeros_params  # noqa: E402
from imagine360_tpu.presets import tiny_dual_config  # noqa: E402
from imagine360_tpu.models.dual import DualUNet, warp_sites  # noqa: E402
from imagine360_tpu.geometry import CameraRig  # noqa: E402
from imagine360_tpu.pipeline.sampler import build_dual_warp_geoms  # noqa: E402
from imagine360_tpu.parallel.mesh import make_mesh, activate_mesh  # noqa: E402

_BYTES = {"pred": 0.125, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2,
          "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
          "u64": 8, "c64": 8, "c128": 16}

_COLLECTIVES = ("all-gather", "all-reduce", "all-to-all",
                "collective-permute", "reduce-scatter")

_SHAPE_RE = re.compile(r"(\w+)\[([0-9,]*)\]")


def _shape_bytes(type_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in _BYTES:
            continue
        n = 1
        for d in filter(None, dims.split(",")):
            n *= int(d)
        total += int(n * _BYTES[dt])
    return total


def collective_bytes(hlo_text: str):
    """{op_kind: [(output_bytes, line_head), ...]} over all collective
    instructions in the module (output bytes = the gathered/reduced
    result's size — the quantity _ici_comm_model accounts)."""
    out = {}
    for line in hlo_text.splitlines():
        ls = line.strip()
        m = re.match(r"%?[\w.\-]+\s*=\s*(.*)", ls)
        if not m:
            continue
        rhs = m.group(1)
        for kind in _COLLECTIVES:
            if re.search(rf"\b{kind}(-start)?\(", rhs):
                ty = rhs.split(kind)[0]
                out.setdefault(kind, []).append(
                    (_shape_bytes(ty), ls[:110]))
                break
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--dump", default=None, help="also write the HLO text")
    a = ap.parse_args()

    # dryrun prod layout: full depth/sites/rig; nano widths (tiny channels)
    M, F = 20, 4
    PH = PW = 16
    EH, EW = 16, 32
    cfg = tiny_dual_config(num_views=M)
    model = DualUNet(cfg)
    rig = CameraRig.icosahedron(image_size=16)
    geoms = build_dual_warp_geoms(cfg, rig, (PH, PW), (EH, EW))
    n_sites = len(warp_sites(len(cfg.pers.block_out_channels)))

    B = 2  # CFG pair
    D = cfg.pano.cross_attention_dim
    Ds, Cs = 16, cfg.pano.image_hidden_size
    args = (
        jnp.zeros((B, M, F, PH, PW, 9), jnp.float32),
        jnp.zeros((B, F, EH, EW, 9), jnp.float32),
        jnp.full((B,), 500.0, jnp.float32),
        jnp.zeros((B * M, 4, D), jnp.float32),
        jnp.zeros((B, 4, D), jnp.float32),
        jnp.full((B,), 8.0, jnp.float32),
        jnp.zeros((B * M, 4, Ds, Cs), jnp.float32),
        jnp.zeros((B, 4, Ds, Cs), jnp.float32),
        jnp.zeros((B, F, 6), jnp.float32),
        jnp.zeros((B, F), jnp.float32),
        geoms,
        jnp.zeros((n_sites,), bool),
    )
    params = _zeros_params(model, args, "float32")

    mesh = make_mesh(8)
    with activate_mesh(mesh):
        fn = jax.jit(lambda p, *a: model.apply(p, *a, add_ip_noise=False))
        print("lowering + compiling the sharded single step...", flush=True)
        compiled = fn.lower(params, *args).compile()
    txt = compiled.as_text()
    if a.dump:
        with open(a.dump, "w") as f:
            f.write(txt)

    colls = collective_bytes(txt)
    summary = {}
    print(f"\ncollectives in the sharded step HLO "
          f"({sum(len(v) for v in colls.values())} instructions):")
    for kind, items in sorted(colls.items()):
        tot = sum(b for b, _ in items)
        summary[kind] = {"count": len(items), "bytes": tot}
        print(f"  {kind:20s} n={len(items):4d}  out_bytes={tot/1e6:8.2f} MB")
        for b, head in sorted(items, reverse=True)[:6]:
            print(f"      {b/1e6:8.3f} MB  {head}")

    import bench
    model_pred = bench._ici_comm_model(
        n=8, frames=F, cfg_batch=2, M=M, steps=1,
        boc=cfg.pers.block_out_channels, pers_hw=(PH, PW),
        equi_hw=(EH, EW), dtype_bytes=4,   # the dryrun model runs f32
        layers_per_block=cfg.pers.layers_per_block)
    ag = summary.get("all-gather", {"bytes": 0})["bytes"]
    pred = model_pred["allgather_bytes_per_step"]
    print(f"\nanalytic model (same shapes): {pred/1e6:.2f} MB/step "
          f"(warp {model_pred['warp_allgather_bytes_per_step']/1e6:.2f} + "
          f"pano-attn "
          f"{model_pred['pano_attn_allgather_bytes_per_step']/1e6:.2f})")
    print(f"HLO all-gather output bytes:  {ag/1e6:.2f} MB/step")
    print(f"ratio HLO/model: {ag/pred:.3f}" if pred else "n/a")
    out = {"hlo": summary,
           "model_bytes": pred,
           "model_warp_bytes":
               model_pred["warp_allgather_bytes_per_step"],
           "model_pano_attn_bytes":
               model_pred["pano_attn_allgather_bytes_per_step"],
           "hlo_allgather_bytes": ag,
           "ratio_hlo_over_model": (ag / pred) if pred else None,
           "layout": {"M": M, "F": F, "PH": PH, "EH": EH, "EW": EW,
                      "boc": list(cfg.pers.block_out_channels)}}
    if a.json:
        with open(a.json, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({"ratio": out["ratio_hlo_over_model"]}))


if __name__ == "__main__":
    main()
