"""Pitch estimation: the self-contained horizon estimator (the built-in
replacement for the reference's external GeoCalib model,
inference_dual_p2e.py:263-273) and the linear pitch fits."""
import numpy as np

from imagine360_tpu.pipeline.elevation import (
    estimate_pitch_horizon, linear_fit_pitch, weighted_linear_fit_pitch,
    PitchEstimator)


def _horizon_frame(pitch_deg, h=256, w=256, fov_deg=90.0):
    """Sky/ground image whose horizon row corresponds to `pitch_deg`
    (positive pitch = camera up = horizon below center)."""
    f = (w / 2.0) / np.tan(np.radians(fov_deg) / 2.0)
    cy = (h - 1) / 2.0
    y_h = int(round(cy + f * np.tan(np.radians(pitch_deg))))
    img = np.full((h, w, 3), 200, np.uint8)
    img[y_h:] = 60
    # texture so Canny has gradients beyond the horizon line itself
    rng = np.random.default_rng(0)
    img = np.clip(img.astype(np.int16)
                  + rng.integers(-8, 8, img.shape), 0, 255).astype(np.uint8)
    return img


def test_horizon_estimator_recovers_known_pitch():
    for true_pitch in (-15.0, 0.0, 10.0):
        frame = _horizon_frame(true_pitch)
        est, wgt = estimate_pitch_horizon(frame)
        assert wgt > 0, f"no horizon found at pitch {true_pitch}"
        assert abs(est - true_pitch) < 2.0, (true_pitch, est)


def test_horizon_estimator_no_edges():
    flat = np.full((64, 64, 3), 128, np.uint8)
    est, wgt = estimate_pitch_horizon(flat)
    assert est == 0.0 and wgt == 0.0


def test_geocalib_mode_runs_without_injected_estimator():
    frames = np.stack([_horizon_frame(5.0) for _ in range(4)])
    pitches = PitchEstimator(mode="geocalib")(frames)
    assert pitches.shape == (4,)
    assert np.all(np.abs(pitches - 5.0) < 2.0), pitches


def test_injected_estimator_takes_precedence():
    frames = np.zeros((3, 32, 32, 3), np.uint8)
    est = PitchEstimator(mode="geocalib", estimator=lambda f: 7.0)
    np.testing.assert_allclose(est(frames), 7.0, atol=1e-6)


def test_linear_fits():
    y = [1.0, 2.0, 3.0, 4.0]
    np.testing.assert_allclose(linear_fit_pitch(y), y, atol=1e-6)
    # zero-weight frames get the fitted line from the weighted frames
    fit = weighted_linear_fit_pitch([1.0, 0.0, 3.0, 0.0],
                                    [1.0, 0.0, 1.0, 0.0])
    np.testing.assert_allclose(fit, [1.0, 2.0, 3.0, 4.0], atol=1e-6)
    assert weighted_linear_fit_pitch([5.0], [0.0]).tolist() == [0.0]


def test_horizon_estimator_accuracy():
    """VERDICT r2 item 7: fitted-pitch RMSE bound on synthetic clips
    rendered at known pitches (full table: tools/elevation_eval.py,
    docs/PARITY.md)."""
    import importlib.util
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "elevation_eval.py")
    spec = importlib.util.spec_from_file_location("elevation_eval", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rows = mod.evaluate(pitch_range=(-20, 20), step=10, frames=6)
    errs = [err for _, _, err, _ in rows]
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert rmse < 2.0, rows
    assert max(errs) < 3.5, rows


def test_robust_fit_guards():
    """Real-footage guards (tools/elevation_real.py findings on the
    reference's own example clips): sparse evidence must not extrapolate
    (cherryblossom fitted -54 -> +53 deg from 5/16 detections), scattered
    evidence must zero out (indoor: raw sigma 20 deg of furniture-edge
    misdetections), and dense consistent evidence must keep the plain
    weighted fit (the synthetic-eval regime)."""
    from imagine360_tpu.pipeline.elevation import robust_fit_pitch

    # dense + consistent: identical to the bare weighted fit
    raw = np.linspace(-3.0, 3.0, 16)
    w = np.ones(16)
    fit = robust_fit_pitch(raw, w)
    np.testing.assert_allclose(fit, weighted_linear_fit_pitch(raw, w),
                               atol=1e-5)

    # sparse noisy detections: constant (weighted median), clamped to 45
    raw = np.zeros(16)
    w = np.zeros(16)
    raw[2], raw[13] = -40.0, 40.0
    w[2], w[13] = 1.0, 1.1
    fit = robust_fit_pitch(raw, w)
    assert np.abs(fit).max() <= 45.0
    assert np.allclose(fit, fit[0])       # constant, no extrapolated ramp

    # scattered (self-contradictory) detections on every frame: zeros
    rng = np.random.default_rng(0)
    raw = rng.normal(20.0, 25.0, 16)
    w = np.ones(16)
    assert np.all(robust_fit_pitch(raw, w) == 0.0)

    # no detections at all: zeros
    assert np.all(robust_fit_pitch(np.zeros(8), np.zeros(8)) == 0.0)
