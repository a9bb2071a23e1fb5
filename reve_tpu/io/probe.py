"""Video probing: frame count / rate / dimensions.

The reference shells out to `mediainfo --Output=Video;%FrameCount%` and
`%FrameRate%` (reve-shared/src/lib.rs:30-57).  Here probing is a backend
chain: ffprobe subprocess when the binary exists, else OpenCV's demuxer —
both normalized into one `VideoInfo`.
"""

from __future__ import annotations

import dataclasses
import fractions
import json
import shutil
import subprocess
from typing import Optional


@dataclasses.dataclass(frozen=True)
class VideoInfo:
    path: str
    width: int
    height: int
    frame_count: int
    fps: fractions.Fraction
    has_audio: bool = False

    @property
    def fps_float(self) -> float:
        return float(self.fps)


def _probe_ffprobe(path: str) -> Optional[VideoInfo]:
    exe = shutil.which("ffprobe")
    if not exe:
        return None
    out = subprocess.run(
        [exe, "-v", "error", "-show_streams", "-count_packets",
         "-of", "json", path],
        capture_output=True, text=True, check=True,
    ).stdout
    data = json.loads(out)
    vstream = next(
        s for s in data["streams"] if s.get("codec_type") == "video"
    )
    has_audio = any(
        s.get("codec_type") == "audio" for s in data["streams"]
    )
    num, den = (int(t) for t in vstream["r_frame_rate"].split("/"))
    frames = int(
        vstream.get("nb_frames") or vstream.get("nb_read_packets") or 0
    )
    return VideoInfo(
        path=path,
        width=int(vstream["width"]),
        height=int(vstream["height"]),
        frame_count=frames,
        fps=fractions.Fraction(num, den),
        has_audio=has_audio,
    )


def _probe_cv2(path: str) -> Optional[VideoInfo]:
    try:
        import cv2
    except ImportError:
        return None
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        return None
    try:
        fps = cap.get(cv2.CAP_PROP_FPS)
        info = VideoInfo(
            path=path,
            width=int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            height=int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            frame_count=int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
            fps=fractions.Fraction(fps).limit_denominator(1001 * 120),
        )
    finally:
        cap.release()
    return info


def _probe_y4m(path: str) -> VideoInfo:
    from reve_tpu.io.reader import Y4MReader

    rd = Y4MReader(path)
    return VideoInfo(
        path=path,
        width=rd.width,
        height=rd.height,
        frame_count=rd.frame_count(),
        fps=fractions.Fraction(rd.fps[0], rd.fps[1]),
    )


def probe(path: str, backend: Optional[str] = None) -> VideoInfo:
    """Probe a video file. backend: None (auto) | 'ffprobe' | 'cv2' | 'y4m'."""
    if path.endswith(".y4m") or backend == "y4m":
        return _probe_y4m(path)
    if backend in (None, "ffprobe"):
        info = _probe_ffprobe(path)
        if info is not None:
            return info
        if backend == "ffprobe":
            raise RuntimeError("ffprobe not available")
    info = _probe_cv2(path)
    if info is None:
        raise RuntimeError(f"cannot probe {path!r}: no working backend")
    return info
