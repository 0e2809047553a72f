"""Quantify the self-contained horizon pitch estimator (VERDICT r2 item 7).

The reference estimates per-frame camera pitch with the external GeoCalib
CUDA model (reference inference_dual_p2e.py:263-273); this repo's default
substitute is a Canny+Hough horizon estimator
(pipeline/elevation.py:estimate_pitch_horizon) whose accuracy was never
quantified. This tool renders synthetic perspective clips from an ERP
ground-truth scene at KNOWN pitches using the repo's own e2p warp, runs the
full estimation path (per-frame horizon estimate -> weighted linear fit,
exactly what PitchEstimator(mode="geocalib") runs without a user callable),
and reports the fitted-pitch error across pitch in [-30, 30] degrees.

Run:  python tools/elevation_eval.py          (CPU, ~1 min)
The error table is recorded in docs/PARITY.md; tests/test_elevation.py
gates the RMSE bound.
"""
import os
import sys

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def synthetic_erp(H=512, W=1024, seed=0):
    """ERP scene with a realistic-ish horizon: gradient sky over textured
    ground, plus off-horizon clutter (clouds, ground boxes) so the
    estimator has distractors."""
    rng = np.random.default_rng(seed)
    img = np.zeros((H, W, 3), np.float32)
    rows = np.arange(H, dtype=np.float32)[:, None]
    horizon = H / 2.0
    sky = rows < horizon
    # sky gradient (bright near horizon)
    img[..., 0] = np.where(sky, 0.45 + 0.4 * rows / horizon, 0.0)
    img[..., 1] = np.where(sky, 0.55 + 0.3 * rows / horizon, 0.0)
    img[..., 2] = np.where(sky, 0.8 + 0.15 * rows / horizon, 0.0)
    # ground: darker, textured
    g = 0.25 + 0.1 * rng.uniform(size=(H, W, 1)).astype(np.float32)
    ground = ~sky
    img = np.where(ground[..., None] * np.ones((1, W, 3), bool), g, img)
    # ground texture boxes (roads/fields)
    for _ in range(40):
        r0 = rng.integers(int(horizon) + 4, H - 16)
        c0 = rng.integers(0, W - 64)
        img[r0:r0 + rng.integers(4, 14), c0:c0 + rng.integers(16, 64)] *= \
            rng.uniform(0.5, 1.5)
    # clouds (elliptical bright blobs in the sky)
    yy, xx = np.mgrid[0:H, 0:W]
    for _ in range(12):
        cy = rng.integers(16, int(horizon) - 40)
        cx = rng.integers(0, W)
        ry, rx = rng.integers(6, 18), rng.integers(20, 70)
        blob = (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) < 1.0
        img[blob] = np.clip(img[blob] + 0.15, 0, 1)
    return np.clip(img, 0, 1)


def render_clip(erp, pitches_deg, thetas_deg, size=256, fov=90.0):
    """Render one perspective frame per (pitch, theta) via the repo e2p."""
    import dataclasses
    import jax.numpy as jnp
    from imagine360_tpu.geometry.cameras import CameraRig, get_K_R
    from imagine360_tpu.geometry.projection import e2p

    frames = []
    e_img = jnp.asarray(erp.transpose(2, 0, 1))   # [3, H, W]
    for p, t in zip(pitches_deg, thetas_deg):
        K, R = get_K_R(fov, t, p, size, size)
        rig = CameraRig(fov=np.array([fov], np.float32),
                        theta=np.array([t], np.float32),
                        phi=np.array([p], np.float32),
                        height=np.array([size], np.int32),
                        width=np.array([size], np.int32),
                        K=K[None], R=R[None])
        out = np.asarray(e2p(e_img, rig, (size, size)))[0]  # [3, s, s]
        frames.append(out.transpose(1, 2, 0))
    u8 = (np.clip(np.stack(frames), 0, 1) * 255).astype(np.uint8)
    return u8


def evaluate(pitch_range=(-30, 30), step=5, frames=8, seed=0):
    from imagine360_tpu.pipeline.elevation import (estimate_pitch_horizon,
                                                   weighted_linear_fit_pitch)
    erp = synthetic_erp(seed=seed)
    rng = np.random.default_rng(seed + 1)
    rows = []
    for true_pitch in range(pitch_range[0], pitch_range[1] + 1, step):
        thetas = rng.uniform(0, 360, size=frames)
        # small per-frame pitch jitter around the clip's true pitch (the
        # reference fits a line over frames; constant truth + jitter-free
        # rendering isolates the estimator error)
        pitches = np.full(frames, float(true_pitch))
        clip = render_clip(erp, pitches, thetas)
        est = [estimate_pitch_horizon(f) for f in clip]
        fit = weighted_linear_fit_pitch([p for p, _ in est],
                                        [w for _, w in est])
        err = float(np.mean(np.abs(fit - true_pitch)))
        n_sig = int(sum(1 for _, w in est if w > 0))
        rows.append((true_pitch, float(np.mean(fit)), err, n_sig))
    return rows


def main():
    rows = evaluate()
    print("| true pitch (deg) | fitted mean | abs err | frames w/ signal |")
    print("|---|---|---|---|")
    errs = []
    for tp, fm, err, n in rows:
        print(f"| {tp:+d} | {fm:+.2f} | {err:.2f} | {n}/8 |")
        errs.append(err)
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    print(f"RMSE over pitch in [-30, 30]: {rmse:.2f} deg")


if __name__ == "__main__":
    main()
