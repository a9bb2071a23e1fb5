"""Teacher->student distillation (reve_tpu.train.distill): the student
learns to match the teacher's outputs; the channel-widening rationale is
PERF.md "Paths past the N=64 wall"."""

import numpy as np
import jax
import pytest

from reve_tpu.models import srvgg
from reve_tpu.train.distill import DistillConfig, Distiller, run_distillation
from reve_tpu.train.trainer import TrainConfig


def _batches(n, batch=4, patch=16, seed=0):
    rs = np.random.RandomState(seed)
    for _ in range(n):
        yield rs.rand(batch, patch, patch, 3).astype(np.float32), None


def test_distillation_improves_agreement():
    tcfg = srvgg.SRVGGConfig(num_feat=16, num_conv=2, upscale=2)
    tparams = srvgg.init_params(jax.random.key(0), tcfg)
    scfg = srvgg.SRVGGConfig(num_feat=8, num_conv=1, upscale=2)
    dist = Distiller(tcfg, tparams, scfg,
                     tc=TrainConfig(learning_rate=3e-3), seed=1)

    probe = np.random.RandomState(9).rand(4, 16, 16, 3).astype(np.float32)
    before = dist.agreement_psnr(probe)
    history = run_distillation(
        dist, _batches(40), DistillConfig(steps=40, log_every=0),
        log=lambda *_: None,
    )
    after = dist.agreement_psnr(probe)
    assert len(history) == 40
    assert history[-1] < history[0]
    assert after > before + 1.0, (before, after)


def test_distillation_hr_blend_and_scale_check():
    import pytest

    tcfg = srvgg.SRVGGConfig(num_feat=8, num_conv=1, upscale=2)
    tparams = srvgg.init_params(jax.random.key(0), tcfg)
    with pytest.raises(ValueError, match="scale mismatch"):
        Distiller(tcfg, tparams,
                  srvgg.SRVGGConfig(num_feat=8, num_conv=1, upscale=3))
    dist = Distiller(tcfg, tparams,
                     srvgg.SRVGGConfig(num_feat=8, num_conv=1, upscale=2))
    rs = np.random.RandomState(0)
    lr_b = rs.rand(4, 16, 16, 3).astype(np.float32)
    hr_b = rs.rand(4, 32, 32, 3).astype(np.float32)
    loss = dist.step(lr_b, hr_b, hr_weight=0.5)
    assert np.isfinite(loss)


@pytest.mark.slow
def test_distill_script_smoke(tmp_path):
    """The CLI driver end-to-end on synthetic data (tiny student/steps)."""
    import subprocess
    import sys
    import os

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    out = str(tmp_path / "student.ckpt")
    code = subprocess.run(
        [sys.executable, "scripts/distill.py", "--teacher",
         "realesr-animevideov3-x2", "--student-feat", "8",
         "--student-conv", "1", "--steps", "6", "--batch", "2",
         "--patch", "16", "--out", out],
        capture_output=True, text=True, timeout=300,
        cwd=env["PYTHONPATH"],
        env={**env, "JAX_PLATFORMS": "cpu"},
    )
    assert code.returncode == 0, code.stderr[-2000:]
    assert "saved student checkpoint" in code.stdout
    assert os.path.isdir(out)
