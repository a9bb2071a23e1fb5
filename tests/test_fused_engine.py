"""apply_fused + engine(fused=True) equivalence on the interpret backend."""

import numpy as np
import jax
import jax.numpy as jnp

from reve_tpu.models import srvgg


def test_apply_fused_matches_apply():
    cfg = srvgg.SRVGGConfig(num_conv=2, num_feat=64, upscale=2)
    params = srvgg.init_params(jax.random.key(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 12, 20, 3), jnp.float32)
    ref = srvgg.apply(params, x, cfg=cfg, compute_dtype=jnp.float32)
    got = srvgg.apply_fused(params, x, cfg=cfg, compute_dtype=jnp.float32,
                            strip=4, core=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-6, rtol=1e-5)


def test_engine_fused_flag():
    from reve_tpu.pipeline.engine import UpscaleEngine

    frames = np.random.RandomState(1).randint(0, 256, (2, 12, 16, 3),
                                              np.uint8)
    kw = dict(model="realesr-animevideov3", scale=2, batch_size=2,
              compute_dtype="float32", tile=-1)
    ref = UpscaleEngine(**kw).submit(frames).result()
    got = UpscaleEngine(fused=True, **kw).submit(frames).result()
    np.testing.assert_array_equal(got, ref)
