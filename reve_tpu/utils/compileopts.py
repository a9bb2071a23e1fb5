"""Default XLA compiler options for TPU inference graphs.

Measured on TPU v5e (scripts/perf_xla_flags.py, PERF.md "scoped VMEM"):
raising XLA's scoped-VMEM budget lets the conv emitter tile deeper and
overlap HBM traffic it otherwise serializes — flagship 1080p->4K x4 jumps
25.7 -> 32.2 fps/chip (+25%) at `xla_tpu_scoped_vmem_limit_kib=65536`,
reproduced across fresh compiles.  The latency-hiding scheduler alone
measured neutral.

Client-side XLA_FLAGS are NOT usable for this on every stack (here the TPU
compiler runs behind a remote-compile service that rejects unknown client
flags); per-compile `compiler_options` go through PJRT and are validated
server-side, so they are the reliable channel.

Override with the env var REVE_TPU_XLA_OPTIONS:
  * ``REVE_TPU_XLA_OPTIONS=""`` (empty)      -> disable (compiler defaults)
  * ``REVE_TPU_XLA_OPTIONS="k=v,k2=v2"``     -> exactly these options
"""

from __future__ import annotations

import os
from typing import Dict, Optional

#: applied to TPU inference compiles unless overridden (see module docstring)
DEFAULT_TPU_OPTIONS: Dict[str, str] = {
    "xla_tpu_scoped_vmem_limit_kib": "65536",
}

_ENV = "REVE_TPU_XLA_OPTIONS"


def env_compiler_options() -> Optional[Dict[str, str]]:
    """Options from REVE_TPU_XLA_OPTIONS alone (None when unset/empty).
    For call sites that must not apply the measured TPU defaults (e.g.
    RRDB-scale graphs, where the scoped-VMEM raise makes compiles
    pathological) but should still honor an explicit user override."""
    env = os.environ.get(_ENV)
    if env is None:
        return None
    env = env.strip()
    if not env:
        return None
    out: Dict[str, str] = {}
    for kv in env.split(","):
        kv = kv.strip()
        if not kv:
            continue
        if "=" not in kv:
            raise ValueError(f"{_ENV}: expected k=v[,k=v...], got {kv!r}")
        k, v = kv.split("=", 1)
        out[k.strip()] = v.strip()
    return out or None


def default_compiler_options(backend: Optional[str] = None
                             ) -> Optional[Dict[str, str]]:
    """Options dict for `jax.jit(..., compiler_options=...)`, or None.

    TPU-only: other backends don't know the TPU flags and would fail to
    compile.  `backend` defaults to jax.default_backend() (queried lazily so
    importing this module never initializes a backend).
    """
    if os.environ.get(_ENV) is not None:
        return env_compiler_options()
    if backend is None:
        import jax

        backend = jax.default_backend()
    return dict(DEFAULT_TPU_OPTIONS) if backend == "tpu" else None
