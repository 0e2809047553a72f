"""Which ops fail to shard over the ('view',) mesh?

Parses the optimized per-device HLO of the denoise step at mesh=1 and
mesh=8 and reports the top ops whose per-device FLOPs did NOT divide —
the concrete targets for better sharding constraints. Reuses
scripts/sharded_flops.py's builder.

Run: python scripts/sharding_gap.py [frames] [scale]
"""
import re
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")
from sharded_flops import build, make_mesh, activate_mesh  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def lower(n_devices, frames, scale):
    from imagine360_tpu.pipeline.sampler import (DualDiffusionSampler,
                                                 SamplerConfig)
    model, cfg, geoms, batch, params = build(frames=frames, scale=scale)
    sampler = DualDiffusionSampler(
        model, SamplerConfig(num_steps=2, add_ip_noise=True))
    mesh = make_mesh(n_devices) if n_devices > 1 else None
    with activate_mesh(mesh):
        ip_pers, ip_pano = jax.jit(sampler.compute_ip)(
            params, jnp.concatenate([batch["ref_feats_pers"]] * 2, 0),
            jnp.concatenate([batch["ref_feats_pano"]] * 2, 0),
            jnp.concatenate([batch["rel_pos"]] * 2, 0),
            jnp.concatenate([batch["pitch"]] * 2, 0))

    def fn(params, key):
        with activate_mesh(mesh):
            return sampler.denoise(
                params, key, batch["pano_latents"], batch["pers_latents"],
                batch["pano_mask"], batch["pano_masked"],
                batch["pers_mask"], batch["pers_masked"],
                jnp.concatenate([batch["pano_text"]] * 2, 0),
                jnp.concatenate([batch["pers_text"]] * 2, 0),
                geoms, jnp.concatenate([batch["fps"]] * 2, 0), None, None,
                jnp.concatenate([batch["rel_pos"]] * 2, 0),
                jnp.concatenate([batch["pitch"]] * 2, 0),
                ip_tokens_pers=ip_pers, ip_tokens_pano=ip_pano)

    return jax.jit(fn).lower(params, jax.random.PRNGKey(0)
                             ).compile().as_text()


_SHAPE = re.compile(r"(bf16|f32|f16)\[([\d,]*)\]")


def op_flops(hlo: str):
    """Rough per-op-name flop map: dots and convs only (metadata op_name
    gives the model-module path)."""
    out = {}
    for line in hlo.splitlines():
        s = line.strip()
        if ("= bf16[" not in s and "= f32[" not in s) or (
                " dot(" not in s and " convolution(" not in s):
            continue
        m = _SHAPE.search(s.split("=", 1)[1])
        if not m:
            continue
        out_elems = 1
        for d in m.group(2).split(","):
            if d:
                out_elems *= int(d)
        # contraction size: product of rhs contracting dims — approximate
        # with the largest operand dim not in the output (good enough for
        # ranking); fall back to rhs last dim
        dims = re.findall(r"\[([\d,]*)\]", s)
        k = 1
        if len(dims) >= 3:
            rhs = [int(x) for x in dims[2].split(",") if x]
            outd = [int(x) for x in dims[0].split(",") if x]
            rem = list(rhs)
            for d in outd:
                if d in rem:
                    rem.remove(d)
            k = max(rem) if rem else (rhs[-1] if rhs else 1)
        name = "?"
        mm = re.search(r'op_name="([^"]*)"', s)
        if mm:
            name = mm.group(1)
            # strip jit prefixes/indices for grouping
            name = re.sub(r"\[[^\]]*\]", "", name)
            name = "/".join(p for p in name.split("/")
                            if not p.startswith(("jit", "while", "body")))
            name = name[-90:]
        out[name] = out.get(name, 0) + 2 * out_elems * k
    return out


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    f1 = op_flops(lower(1, frames, scale))
    f8 = op_flops(lower(8, frames, scale))
    rows = []
    for name, v8 in f8.items():
        v1 = f1.get(name, 0)
        rows.append((v8, v1, name))
    rows.sort(reverse=True)
    print(f"{'flops/dev@8d':>14} {'@1d':>14} {'ratio':>6}  op")
    shown = 0
    for v8, v1, name in rows[:25]:
        r = (v1 / v8) if v8 else float("inf")
        print(f"{v8:14.3e} {v1:14.3e} {r:6.2f}  {name}")
        shown += v8
    tot8 = sum(v for v, _, _ in rows)
    tot1 = sum(v1 for _, v1, _ in rows)
    print(f"TOTAL dot/conv flops: 8d/device {tot8:.3e}  1d {tot1:.3e}  "
          f"ratio {tot1 / tot8:.2f}x  (top-25 cover "
          f"{shown / max(tot8, 1):.0%})")


if __name__ == "__main__":
    main()
