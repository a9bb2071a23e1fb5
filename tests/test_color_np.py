"""numpy host-side color paths must match the jit'ed device versions."""

import numpy as np
import jax.numpy as jnp

from reve_tpu.ops import color, color_np


def test_np_matches_jax_rgb_to_yuv420():
    rs = np.random.RandomState(0)
    frame = rs.randint(0, 256, (16, 24, 3), np.uint8)
    for bits in (8, 10):
        for matrix in ("bt601", "bt709"):
            yn, un, vn = color_np.rgb_to_yuv420_np(frame, matrix=matrix,
                                                bits=bits)
            yj, uj, vj = color.rgb_to_yuv420(
                jnp.asarray(frame, jnp.float32)[None] / 255.0,
                matrix=matrix, bits=bits,
            )
            # float rounding at quantization boundaries: allow 1 code step
            assert np.abs(yn.astype(int) - np.asarray(yj[0]).astype(int)).max() <= 1
            assert np.abs(un.astype(int) - np.asarray(uj[0]).astype(int)).max() <= 1
            assert np.abs(vn.astype(int) - np.asarray(vj[0]).astype(int)).max() <= 1


def test_np_matches_jax_yuv420_to_rgb():
    rs = np.random.RandomState(1)
    y = rs.randint(16, 236, (16, 24), np.uint8)
    u = rs.randint(16, 241, (8, 12), np.uint8)
    v = rs.randint(16, 241, (8, 12), np.uint8)
    got = color_np.yuv420_to_rgb_np(y, u, v, matrix="bt601")
    ref = color.yuv420_to_rgb(
        jnp.asarray(y[None]), jnp.asarray(u[None]), jnp.asarray(v[None]),
        matrix="bt601",
    )
    ref = np.clip(np.asarray(ref[0]) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_io_threads_do_not_touch_jax(tmp_path, monkeypatch):
    """Writers/readers must work without initializing any jax backend."""
    import fractions
    import subprocess
    import sys

    code = """
import sys
sys.path.insert(0, {repo!r})
import fractions, numpy as np
sys.modules['jax'] = None  # poison: any jax import in the IO path blows up
sys.modules['jax.numpy'] = None
from reve_tpu.io import writer, reader
p = {path!r}
with writer.Y4MWriter(p, 32, 16, fractions.Fraction(24)) as w:
    for i in range(3):
        w.write(np.full((16, 32, 3), 40 + i, np.uint8))
r = reader.Y4MReader(p)
frames = list(r.read_range(0, 3))
assert len(frames) == 3 and frames[0].shape == (16, 32, 3)
print("io-without-jax ok")
""".format(repo="/root/repo", path=str(tmp_path / "t.y4m"))
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True)
    assert "io-without-jax ok" in out.stdout, out.stderr
