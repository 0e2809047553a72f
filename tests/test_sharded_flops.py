"""Scaling evidence regression: XLA's per-device cost analysis must show
the denoise step's FLOPs actually dividing over the ('view',) mesh.

Runs scripts/sharded_flops.py (frames=8, 2x spatial — the smallest shape
where the pano latent H divides over 8 devices through two UNet levels)
in a subprocess and asserts the per-device FLOP ratio stays near-linear.
Guards against sharding-constraint regressions that leave a branch
replicated (e.g. the frame-axis pano sharding that silently de-sharded at
every [B,F]->[B*F] fold and scaled only 4.8x; see parallel/mesh.py
shard_pano)."""
import re
import subprocess
import sys


def test_per_device_flops_divide():
    out = subprocess.run(
        [sys.executable, "scripts/sharded_flops.py", "8", "2"],
        capture_output=True, text=True, timeout=1800).stdout
    m = re.search(r"ratio 1d/8d = ([\d.]+)x", out)
    assert m, out
    ratio = float(m.group(1))
    # 7.83x measured at this shape; production (20 views, 16 frames, 8x
    # spatial) divides at least as well. 7.0 allows compiler-version noise.
    assert ratio > 7.0, f"per-device FLOP ratio degraded: {ratio}x\n{out}"
