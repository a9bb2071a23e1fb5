"""Seam-exactness: halo-padded tiled inference == whole-frame inference.

This is the fix for the reference's documented "block inconsistency" tiling
artifact (/root/reference/README.md:74): with halo >= receptive-field radius,
tiling must be bit-identical in f32, not just close.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reve_tpu.models import srvgg
from reve_tpu.ops import tiling


def _model(upscale=2, num_conv=3, num_feat=8):
    cfg = srvgg.SRVGGConfig(num_conv=num_conv, num_feat=num_feat, upscale=upscale)
    params = srvgg.init_params(jax.random.key(0), cfg)
    # the tiled path runs the classic (non-s2d) stack: bit-exact seams
    # require identical reduction order regardless of a tile's row parity
    return cfg, params, lambda t: srvgg.apply(params, t, cfg=cfg, s2d=False)


@pytest.mark.parametrize("hw", [(33, 47), (64, 64), (30, 100)])
@pytest.mark.parametrize("tile", [16, 32])
def test_tiled_equals_whole_frame(hw, tile):
    cfg, params, fn = _model()
    halo = cfg.num_conv + 2  # receptive-field radius: 1 px per 3x3 conv
    h, w = hw
    x = jnp.asarray(np.random.RandomState(0).rand(2, h, w, 3), jnp.float32)
    whole = fn(x)
    tiled = tiling.upscale_tiled(fn, x, scale=cfg.upscale, tile=tile, halo=halo)
    np.testing.assert_array_equal(np.asarray(tiled), np.asarray(whole))


def test_insufficient_halo_differs():
    # Sanity check that the test above is meaningful: with halo smaller than
    # the receptive field, seams appear.
    cfg, params, fn = _model(num_conv=3)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 40, 40, 3), jnp.float32)
    whole = fn(x)
    tiled = tiling.upscale_tiled(fn, x, scale=cfg.upscale, tile=16, halo=1)
    assert not np.array_equal(np.asarray(tiled), np.asarray(whole))


def test_plan_geometry():
    plan = tiling.plan_tiles(1080, 1920, tile=256, halo=18)
    assert (plan.rows, plan.cols) == (5, 8)
    assert plan.window_shape == (256 + 36, 256 + 36)
    assert plan.num_tiles == 40
    # every window lies inside the frame; every core is covered exactly once
    covered = [0] * 1080
    for (ws, off, size, start) in plan.row_axis.spans:
        assert 0 <= ws and ws + plan.window_shape[0] <= 1080
        for i in range(start, start + size):
            covered[i] += 1
    assert all(c == 1 for c in covered)


def test_small_frame_single_window():
    # Frame smaller than window on one axis -> window clamps to frame size.
    plan = tiling.plan_tiles(20, 100, tile=32, halo=8)
    assert plan.rows == 1 and plan.window_shape[0] == 20


@pytest.mark.parametrize("scale", [2, 3])
def test_extract_assemble_identity(scale):
    # With halo=0 and an identity "model" that nearest-upsamples, assembly
    # must reproduce the upsampled frame.
    from reve_tpu.ops.resize import upsample_nearest

    x = jnp.asarray(np.random.RandomState(1).rand(2, 20, 28, 3), jnp.float32)
    out = tiling.upscale_tiled(
        lambda t: upsample_nearest(t, scale), x, scale=scale, tile=8, halo=0
    )
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(upsample_nearest(x, scale))
    )


@pytest.mark.parametrize("hw,tile", [((32, 44), 16), ((64, 64), 32)])
def test_tiled_s2d_equals_whole_frame_even_geometry(hw, tile):
    """With even frame height, even tile and even halo, every window
    row-origin is even, so the s2d stack keeps the same global row parity
    in every tile -> tiled output is bit-identical to the s2d whole frame."""
    cfg = srvgg.SRVGGConfig(num_conv=2, num_feat=8, upscale=2)  # halo 4
    params = srvgg.init_params(jax.random.key(0), cfg)

    def fn(t):
        return srvgg.apply(params, t, cfg=cfg, s2d=True)

    halo = cfg.num_conv + 2
    assert halo % 2 == 0 and tile % 2 == 0 and hw[0] % 2 == 0
    h, w = hw
    x = jnp.asarray(np.random.RandomState(1).rand(2, h, w, 3), jnp.float32)
    whole = fn(x)
    tiled = tiling.upscale_tiled(fn, x, scale=cfg.upscale, tile=tile,
                                 halo=halo)
    np.testing.assert_array_equal(np.asarray(tiled), np.asarray(whole))
