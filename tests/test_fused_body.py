"""Fused-body Pallas kernel vs the layer-by-layer XLA reference.

Runs in Pallas interpret mode on CPU (hermetic); the TPU compiled path is
exercised by bench.py and scripts/perf_fused.py on hardware.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reve_tpu.models import srvgg
from reve_tpu.ops import fused_body


def _reference_hidden(params, x, num_conv, dtype):
    """The exact XLA path the kernel replaces: srvgg hidden convs only."""
    h = x.astype(dtype)
    for i in range(num_conv):
        h = srvgg._prelu(
            srvgg._conv3x3(
                h,
                params["convs"][i + 1]["w"].astype(dtype),
                params["convs"][i + 1]["b"],
            ),
            params["prelus"][i + 1]["alpha"],
        )
    return h


@pytest.mark.parametrize("hw", [(16, 24), (13, 19), (8, 8)])
@pytest.mark.parametrize("num_conv", [1, 3])
def test_matches_xla_reference_f32(hw, num_conv):
    H, W = hw
    cfg = srvgg.SRVGGConfig(num_conv=num_conv, num_feat=64, upscale=2)
    params = srvgg.init_params(jax.random.key(0), cfg)
    x = jnp.asarray(
        np.random.RandomState(1).rand(2, H, W, 64), jnp.float32
    )
    want = _reference_hidden(params, x, num_conv, jnp.float32)
    ws, bs, as_ = fused_body.stack_hidden_params(params, num_conv)
    got = fused_body.fused_hidden_body(
        x, ws, bs, as_, height=H, width=W, strip=4, core=16,
        compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-6, rtol=1e-5
    )


def test_multi_column_tiles():
    """Width spanning several column tiles; interior margins must be seamless."""
    H, W = 12, 50
    cfg = srvgg.SRVGGConfig(num_conv=2, num_feat=64, upscale=2)
    params = srvgg.init_params(jax.random.key(1), cfg)
    x = jnp.asarray(np.random.RandomState(2).rand(1, H, W, 64), jnp.float32)
    want = _reference_hidden(params, x, 2, jnp.float32)
    ws, bs, as_ = fused_body.stack_hidden_params(params, 2)
    got = fused_body.fused_hidden_body(
        x, ws, bs, as_, height=H, width=W, strip=4, core=16,
        compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-6, rtol=1e-5
    )


def test_strip_not_dividing_height():
    H, W = 10, 16   # 10+2 not divisible by strip 4
    cfg = srvgg.SRVGGConfig(num_conv=2, num_feat=64, upscale=2)
    params = srvgg.init_params(jax.random.key(2), cfg)
    x = jnp.asarray(np.random.RandomState(3).rand(1, H, W, 64), jnp.float32)
    want = _reference_hidden(params, x, 2, jnp.float32)
    ws, bs, as_ = fused_body.stack_hidden_params(params, 2)
    got = fused_body.fused_hidden_body(
        x, ws, bs, as_, height=H, width=W, strip=4, core=16,
        compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-6, rtol=1e-5
    )


@pytest.mark.parametrize("kdim", [192, 256])
@pytest.mark.parametrize("msplit", [1, 2])
@pytest.mark.parametrize("fast_interior", [False, True])
def test_v4_knobs_match_reference(kdim, msplit, fast_interior):
    """The v4 tuning knobs (K padding, row-chunked dots, interior fast
    path) are numerics-neutral: all combinations must equal the XLA path.
    H is large enough that interior strips exist (i*S >= L+1)."""
    H, W = 24, 20
    num_conv = 2
    cfg = srvgg.SRVGGConfig(num_conv=num_conv, num_feat=64, upscale=2)
    params = srvgg.init_params(jax.random.key(3), cfg)
    x = jnp.asarray(np.random.RandomState(4).rand(1, H, W, 64), jnp.float32)
    want = _reference_hidden(params, x, num_conv, jnp.float32)
    ws, bs, as_ = fused_body.stack_hidden_params(params, num_conv)
    got = fused_body.fused_hidden_body(
        x, ws, bs, as_, height=H, width=W, strip=4, core=16,
        compute_dtype=jnp.float32, interpret=True,
        kdim=kdim, msplit=msplit, fast_interior=fast_interior,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-6, rtol=1e-5
    )
