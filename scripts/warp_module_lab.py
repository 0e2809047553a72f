"""Full WarpAttn MODULE cost per site, standalone (step attribution tool).

step_breakdown.py: the 7 WarpAttn couplings cost 812 ms/step in-model.
warp_site_lab.py: the attention ops themselves cost ~142 ms/step. This lab
times the FULL WarpAttn module (norms + QKV/out projections + GEGLU FF +
bias selects + layout moves + attention) standalone at the real production
site shapes with the real precomputed geoms, to answer: does the remaining
~670 ms exist standalone (iterate here), or only in the full-model context
(layout assignment problem)?

Variants per site:
  module  - production call: traced use_opp bool (in-scan bias select)
  static  - use_opp constant-folded (no per-step select, biases baked)

Real site shapes (B = 2 CFG, M = 20 views, F = 16 frames):
  r2 (enc_0+dec_2, x2): C=320   pers [40,16,16,16,C]  equi [2,16,32,64,C]
  r4 (enc_1+dec_1, x2): C=640   pers [40,16, 8, 8,C]  equi [2,16,16,32,C]
  r8 (enc_2+mid+dec_0, x3): C=1280 pers [40,16,4,4,C] equi [2,16, 8,16,C]

Run: python scripts/warp_module_lab.py [r2 r4 r8]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from imagine360_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

B, M, F = 2, 20, 16
# (rkey, C, pers_h, equi_h, equi_w, n_sites)
SITES = [
    ("r2", 320, 16, 32, 64, 2),
    ("r4", 640, 8, 16, 32, 2),
    ("r8", 1280, 4, 8, 16, 3),
]


def main():
    import jax
    import jax.numpy as jnp
    from imagine360_tpu.geometry import CameraRig
    from imagine360_tpu.geometry.corr_masks import warp_geometry
    from imagine360_tpu.models.warp import WarpAttn
    import ml_dtypes

    only = set(sys.argv[1:])
    jd = jnp.bfloat16
    totals = {}
    for rkey, C, ph, eh, ew, mult in SITES:
        if only and rkey not in only:
            continue
        rig = CameraRig.icosahedron(image_size=256).take(M)
        g = warp_geometry(rig, (ph, ph), (eh, ew), dim=C)
        geom = {k: (jnp.asarray(v.astype(ml_dtypes.bfloat16))
                    if "bias" in k else jnp.asarray(v))
                for k, v in g.items()}

        model = WarpAttn(C, M, dtype=jd)
        key = jax.random.PRNGKey(0)
        pers_x = jax.random.normal(key, (B * M, F, ph, ph, C), jd)
        equi_x = jax.random.normal(jax.random.fold_in(key, 1),
                                   (B, F, eh, ew, C), jd)
        params = model.init(jax.random.PRNGKey(1), pers_x, equi_x, geom,
                            jnp.asarray(False))

        def report(name, fn, *args):
            run = jax.jit(fn)
            t0 = time.time()
            jax.block_until_ready(run(*args))
            comp = time.time() - t0
            best = float("inf")
            for _ in range(5):
                t0 = time.time()
                jax.block_until_ready(run(*args))
                best = min(best, time.time() - t0)
            print(f"{rkey:3s} {name:7s} {best*1000:7.2f} ms  (x{mult} sites;"
                  f" compile {comp:.0f}s)", flush=True)
            totals.setdefault(name, 0.0)
            totals[name] += best * mult

        report("module",
               lambda p, px, ex, opp: jax.tree.map(
                   lambda o: jnp.sum(o.astype(jnp.float32)),
                   model.apply(p, px, ex, geom, opp)),
               params, pers_x, equi_x, jnp.asarray(False))
        report("static",
               lambda p, px, ex: jax.tree.map(
                   lambda o: jnp.sum(o.astype(jnp.float32)),
                   model.apply(p, px, ex, geom, False)),
               params, pers_x, equi_x)

    print("\nper-step totals over all 7 warp sites:", flush=True)
    for name, t in sorted(totals.items(), key=lambda kv: kv[1]):
        print(f"  {name:7s} {t*1000:7.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
