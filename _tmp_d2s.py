"""Probe 4K u8 depth-to-space variants standalone: who is slow?"""
import time
import numpy as np, jax, jax.numpy as jnp

rs = np.random.RandomState(0)
B, H, W, r, c = 2, 2160, 3840, 4, 3
x = jax.device_put(rs.randint(0, 256, (B, H, W, r*r*c), np.uint8))

def measure(name, fn, *args):
    try:
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        o = jf(*args); jax.block_until_ready(o)
        comp = time.perf_counter() - t0
        float(jnp.sum(o.astype(jnp.int32)))
        t0 = time.perf_counter()
        for _ in range(4):
            o = jf(*args)
        float(jnp.sum(o.astype(jnp.int32)))
        dt = (time.perf_counter() - t0) / 4
        gbs = x.nbytes / dt / 1e9
        print(f"{name}: compile {comp:.0f}s, {dt*1e3:.0f} ms/call ({gbs:.0f} GB/s eff)", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:140]}", flush=True)

from reve_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_shuffle_rowphase

measure("classic d2s u8 standalone", lambda v: pixel_shuffle(v, r), x)
measure("rowphase d2s u8 standalone", lambda v: pixel_shuffle_rowphase(v, r), x)
i_, j_, c_ = np.meshgrid(np.arange(r), np.arange(r), np.arange(c), indexing="ij")
perm = jnp.asarray((c_ * r * r + i_ * r + j_).reshape(-1))
measure("lane gather(48) alone", lambda v: v[..., perm], x)
def rowphase_nogather(v):
    vv = v.reshape(B, H, W, r, r*c)
    rows = [vv[:, :, :, i, :].reshape(B, H, W*r, c) for i in range(r)]
    return jnp.stack(rows, axis=2).reshape(B, H*r, W*r, c)
measure("rowphase WITHOUT gather", rowphase_nogather, x)
