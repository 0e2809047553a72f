"""Host-side video IO (imageio/ffmpeg; the reference used decord for reads
and imageio for writes — inference_dual_p2e.py:502-513,
animatediff/utils/util.py:55-72). Not TPU work by design."""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def read_video(path: str, num_frames: Optional[int] = None) -> np.ndarray:
    """Read a video, uniformly subsampling to num_frames
    (reference temporal downsample, inference_dual_p2e.py:504-510).
    Returns [F, H, W, 3] uint8."""
    if path.endswith(".npy"):
        frames = np.load(path)
    else:
        frames = None
        if path.endswith((".mp4", ".mov", ".webm", ".avi")):
            frames = _read_video_cv2(path)
        if frames is None:
            import imageio.v3 as iio
            try:
                frames = iio.imread(path, plugin="pyav") if path.endswith(
                    (".mp4", ".mov", ".webm")) else iio.imread(path)
            except Exception:
                frames = iio.imread(path)
    frames = np.asarray(frames)
    if frames.ndim == 3:
        frames = frames[None]
    if num_frames is not None and frames.shape[0] != num_frames:
        total = frames.shape[0]
        if total >= num_frames:
            idx = np.linspace(0, total - 1, num_frames).round().astype(int)
        else:
            idx = np.arange(num_frames) % total
        frames = frames[idx]
    return frames[..., :3]


def _read_video_cv2(path: str):
    """OpenCV decode fallback (this image ships no ffmpeg/pyav/decord;
    cv2's bundled codecs handle the reference example MP4s). Returns
    [F, H, W, 3] RGB uint8 or None (also None when cv2 is absent — the
    'host' extra is optional; callers fall back to imageio)."""
    try:
        import cv2
    except ImportError:
        return None

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        return None
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    return np.stack(frames) if frames else None


def save_video(frames: np.ndarray, path: str, fps: int = 8):
    """frames [F, H, W, 3] float in [0, 1] or uint8 -> mp4
    (reference save_videos_grid, animatediff/utils/util.py:55-72)."""
    import imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if frames.dtype != np.uint8:
        frames = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    try:
        imageio.mimsave(path, list(frames), fps=fps)
        return
    except Exception:
        pass
    if _save_video_cv2(frames, path, fps):
        return
    # fall back to individual PNG frames when no video codec exists
    base = os.path.splitext(path)[0]
    os.makedirs(base, exist_ok=True)
    for i, f in enumerate(frames):
        imageio.imwrite(os.path.join(base, f"{i:04d}.png"), f)


def _save_video_cv2(frames: np.ndarray, path: str, fps: int) -> bool:
    try:
        import cv2
    except ImportError:
        return False

    h, w = frames.shape[1:3]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not vw.isOpened():
        return False
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()
    return os.path.exists(path) and os.path.getsize(path) > 0


def to_model_range(frames_u8: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1, 1]."""
    return frames_u8.astype(np.float32) / 127.5 - 1.0


def from_model_range(frames: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> [0, 1] float."""
    return np.clip(frames / 2 + 0.5, 0.0, 1.0)


def resize_frames(frames: np.ndarray, hw) -> np.ndarray:
    import cv2

    return np.stack([cv2.resize(f, (hw[1], hw[0]),
                                interpolation=cv2.INTER_LINEAR)
                     for f in frames])


def draw_mask_boundary(frames: np.ndarray, mask: np.ndarray,
                       color=(1.0, 0.0, 0.0), thickness: int = 2) -> np.ndarray:
    """Overlay the outpaint-mask boundary on frames for debugging
    (reference get_boundingbox, animatediff/utils/util.py:114-163).
    frames [F, H, W, 3] in [0,1]; mask [F, H, W, 1]."""
    import cv2

    out = frames.copy()
    for f in range(frames.shape[0]):
        m = (mask[f, ..., 0] > 0.5).astype(np.uint8)
        contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        img = np.ascontiguousarray(out[f])
        cv2.drawContours(img, contours, -1, color, thickness)
        out[f] = img
    return out


def feathered_replace(generated: np.ndarray, source: np.ndarray,
                      mask: np.ndarray, sigma: float = 8.0) -> np.ndarray:
    """Composite the known (input) region back over the generated pano with
    a gaussian-feathered seam (reference replace_video,
    animatediff/utils/util.py:75-111). All [F, H, W, C] in [0, 1];
    mask 1 = generated region."""
    import cv2

    out = []
    for f in range(generated.shape[0]):
        m = mask[f, ..., 0].astype(np.float32)
        soft = cv2.GaussianBlur(m, (0, 0), sigma)
        soft = np.clip(soft, 0, 1)[..., None]
        out.append(generated[f] * soft + source[f] * (1 - soft))
    return np.stack(out)
