"""Host-side video/image IO.

The reference writes mp4s via torchvision/ffmpeg (generate.py:246) and reads
prompt frames via torchvision.io.read_image (generate.py:152). Video IO is a
host (CPU) concern on TPU-VMs; we use OpenCV with an imageio fallback so no
torch dependency enters the serving path.
"""

from __future__ import annotations

import numpy as np


def write_video(path: str, frames: np.ndarray, fps: int = 10) -> None:
    """frames: (T, H, W, 3) uint8 RGB."""
    frames = np.asarray(frames)
    assert frames.ndim == 4 and frames.shape[-1] == 3, frames.shape
    assert frames.dtype == np.uint8, frames.dtype
    try:
        import cv2

        h, w = frames.shape[1:3]
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        writer = cv2.VideoWriter(path, fourcc, fps, (w, h))
        try:
            if not writer.isOpened():
                raise RuntimeError("cv2.VideoWriter failed to open")
            for frame in frames:
                writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        finally:
            writer.release()
    except Exception as cv2_err:
        try:
            import imageio

            imageio.mimwrite(path, list(frames), fps=fps)
        except Exception as io_err:
            # surface BOTH causes — the imageio error alone hides e.g. a
            # missing output directory that made cv2 fail in the first place
            raise RuntimeError(
                f"write_video failed: cv2: {cv2_err!r}; imageio: {io_err!r}"
            ) from io_err


def read_video(path: str) -> np.ndarray:
    """Read a video into (T, H, W, 3) uint8 RGB."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    return np.stack(frames) if frames else np.zeros((0, 0, 0, 3), np.uint8)


def read_image(path: str, size_hw: tuple[int, int] | None = None) -> np.ndarray:
    """Read an image as float32 (3, H, W) in [0, 1], optionally resized
    (bilinear) — mirrors the reference prompt path (generate.py:150-154)."""
    with open(path, "rb") as f:
        return read_image_bytes(f.read(), size_hw)


def read_image_bytes(data: bytes,
                     size_hw: tuple[int, int] | None = None) -> np.ndarray:
    """read_image over in-memory encoded bytes (HTTP serving path)."""
    import io as _io

    from PIL import Image

    img = Image.open(_io.BytesIO(data)).convert("RGB")
    if size_hw is not None:
        img = img.resize((size_hw[1], size_hw[0]), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return arr.transpose(2, 0, 1)
