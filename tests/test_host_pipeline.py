"""Host-side pipeline pieces: maxrect, pitch fit, anchor extraction,
training masks, config round-trip, native remap."""
import numpy as np
import pytest

from imagine360_tpu.pipeline.anchor import (max_inscribed_rect,
                                            get_anchor_target)
from imagine360_tpu.pipeline.elevation import (linear_fit_pitch,
                                               pers_video_to_pano,
                                               PitchEstimator)
from imagine360_tpu.pipeline.train_masks import video_mask, erp_coverage_mask
from imagine360_tpu.config import RunConfig


def test_max_inscribed_rect_simple():
    m = np.zeros((8, 10), bool)
    m[2:6, 3:9] = True
    top, left, w, h = max_inscribed_rect(m)
    assert (top, left, w, h) == (2, 3, 6, 4)
    # degenerate: all zeros
    assert max_inscribed_rect(np.zeros((4, 4)))[2:] == (0, 0)
    # full
    assert max_inscribed_rect(np.ones((4, 6))) == (0, 0, 6, 4)


def test_max_inscribed_rect_matches_reference_dp():
    """Cross-check against the reference's DP implementation on random
    masks (src/modules/utils.py:39-73 returns the same area)."""
    import refshim
    if not refshim.available():
        pytest.skip("no reference")
    refshim.install()
    from src.modules.utils import get_maxrec_cord
    rng = np.random.default_rng(0)
    for _ in range(5):
        m = (rng.uniform(size=(12, 17)) > 0.35).astype(np.float64)
        ours = max_inscribed_rect(m)
        theirs = get_maxrec_cord(m)
        assert ours[2] * ours[3] == theirs[2] * theirs[3]


def test_linear_fit_pitch():
    y = [1.0, 2.1, 2.9, 4.2]
    fit = linear_fit_pitch(y)
    # monotone line, close to the data
    assert fit.shape == (4,)
    assert abs(fit[0] - 1.0) < 0.3 and abs(fit[-1] - 4.2) < 0.3
    np.testing.assert_allclose(np.diff(fit), np.diff(fit)[0], atol=1e-5)
    # constant input -> constant output
    np.testing.assert_allclose(linear_fit_pitch([3.0, 3.0, 3.0]), 3.0,
                               atol=1e-6)


def test_pers_video_to_pano_masks():
    frames = np.zeros((2, 32, 32, 3), np.float32)
    pano, mask = pers_video_to_pano(frames, np.zeros(2), (32, 64))
    assert pano.shape == (2, 32, 64, 3)
    assert mask.shape == (2, 32, 64, 1)
    # a 90-degree view covers part but not all of the sphere
    frac = 1 - mask.mean()
    assert 0.05 < frac < 0.5


def test_get_anchor_target_shapes():
    rng = np.random.default_rng(0)
    pano = rng.uniform(-1, 1, size=(2, 32, 64, 3)).astype(np.float32)
    out = get_anchor_target(pano, pitches=[0.0, 5.0], anchor_size=16)
    assert out["anchor"].shape == (2, 16, 16, 3)
    assert out["anchor_pers"].shape == (2, 16, 16, 3)
    assert out["masks"].shape == (2, 32, 64, 1)
    assert out["relative_position"].shape == (2, 6)
    np.testing.assert_array_equal(out["relative_position"][:, 4:],
                                  [[32, 64], [32, 64]])


def test_video_mask_modes():
    rng = np.random.default_rng(1)
    for mode in ("horizontal", "vertical", "float"):
        m = video_mask(rng, (32, 64), mode)
        assert m.shape == (32, 64, 1)
        assert 0 < m.mean() < 1


def test_erp_coverage_mask():
    cover, top, left, ahw = erp_coverage_mask((32, 64), anchor_size=16)
    assert cover.shape == (32, 64, 1)
    assert cover.mean() > 0.5          # 11 views cover most of the sphere
    assert ahw[0] > 0 and ahw[1] > 0   # a forward hole exists


def test_config_roundtrip(tmp_path):
    cfg = RunConfig(pano_H=256, num_inference_steps=10)
    p = str(tmp_path / "c.yaml")
    cfg.to_yaml(p)
    c2 = RunConfig.from_yaml(p)
    assert c2.pano_H == 256 and c2.num_inference_steps == 10
    assert c2.scheduler.prediction_type == "v_prediction"
