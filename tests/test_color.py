"""Colorspace op tests: roundtrips, known code values, cv2 cross-check."""

import numpy as np
import jax.numpy as jnp
import pytest

from reve_tpu.ops import color


def test_primary_code_values_bt601_limited():
    # Classic BT.601 studio-range anchors: black=16, white=235 (Y), gray chroma=128.
    black = np.zeros((1, 2, 2, 3), np.float32)
    white = np.ones((1, 2, 2, 3), np.float32)
    rgb = jnp.asarray(np.concatenate([black, white], axis=2))  # (1,2,4,3)
    y, u, v = color.rgb_to_yuv420(rgb, matrix="bt601", bits=8)
    assert y[0, 0, 0] == 16 and y[0, 0, 2] == 235
    assert u[0, 0, 0] == 128 and v[0, 0, 0] == 128


def test_rgb_yuv_roundtrip_444():
    rgb = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3), jnp.float32)
    for matrix in ("bt601", "bt709"):
        y, u, v = color.rgb_to_yuv(rgb, matrix=matrix)
        back = color.yuv_to_rgb(y, u, v, matrix=matrix)
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


@pytest.mark.parametrize("bits", [8, 10])
@pytest.mark.parametrize("full_range", [False, True])
def test_yuv420_roundtrip_within_quantization(bits, full_range):
    # Use a chroma-smooth image (constant 2x2 blocks) so 4:2:0 subsampling is
    # lossless and the only error left is code-value quantization.
    rs = np.random.RandomState(1)
    small = rs.rand(1, 4, 6, 3).astype(np.float32)
    rgb = jnp.asarray(np.repeat(np.repeat(small, 2, axis=1), 2, axis=2))
    y, u, v = color.rgb_to_yuv420(rgb, bits=bits, full_range=full_range)
    back = color.yuv420_to_rgb(y, u, v, bits=bits, full_range=full_range)
    tol = 3.0 / (219 * (1 << (bits - 8)))  # a few code steps
    assert float(jnp.abs(back - rgb).max()) < tol


def test_yuv420p10_dtype_and_range():
    rgb = jnp.asarray(np.random.RandomState(2).rand(1, 8, 8, 3), jnp.float32)
    y, u, v = color.rgb_to_yuv420(rgb, bits=10)
    assert y.dtype == jnp.uint16 and u.dtype == jnp.uint16
    assert int(y.max()) <= 1023 and int(y.min()) >= 0
    assert u.shape == (1, 4, 4)


def test_against_cv2_i420():
    cv2 = pytest.importorskip("cv2")
    rs = np.random.RandomState(3)
    h, w = 16, 24
    yuv = rs.randint(16, 230, size=(h * 3 // 2, w), dtype=np.uint8)
    rgb_cv = cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB_I420).astype(np.float32) / 255.0

    y = jnp.asarray(yuv[:h][None])
    u = jnp.asarray(yuv[h:h + h // 4].reshape(h // 2, w // 2)[None])
    v = jnp.asarray(yuv[h + h // 4:].reshape(h // 2, w // 2)[None])
    got = color.yuv420_to_rgb(y, u, v, matrix="bt601", full_range=False)
    got = np.clip(np.asarray(got)[0], 0, 1)
    # cv2's I420 path is BT.601 limited-range with integer approximations;
    # allow a few 8-bit steps of difference.
    assert np.abs(got - rgb_cv).max() < 6.0 / 255.0
