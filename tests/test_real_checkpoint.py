"""Round-trip of a checkpoint the torch reference trainer ACTUALLY wrote.

tests/test_reference_parity.py feeds the converter randomly-initialized
state_dicts; the published pretrained blob is missing upstream.  This
runs the unmodified reference trainer for one CPU epoch (via
scripts/make_reference_checkpoint.py) to produce a real ``network.pth``
+ ``opt.pickle``, then drives scripts/verify_reference_checkpoint.py and
the ``apps.common.load_pretrained`` .pth branch from it (VERDICT r2 #6).
"""
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE, "train.py")),
    reason="reference mount not available")


@pytest.fixture(scope="module")
def real_ckpt(tmp_path_factory):
    work = tmp_path_factory.mktemp("ref_train")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "make_reference_checkpoint.py"),
         str(work)],
        capture_output=True, text=True, timeout=2700)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    exp = proc.stdout.strip().splitlines()[-1]
    assert os.path.exists(os.path.join(exp, "epochs", "0", "network.pth"))
    return exp


@pytest.mark.slow
def test_verify_reference_checkpoint_script(real_ckpt):
    """Converter parity vs the executed torch model on the REAL .pth."""
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "verify_reference_checkpoint.py"),
         "--ckpt", os.path.join(real_ckpt, "epochs", "0", "network.pth"),
         "--opt", os.path.join(real_ckpt, "opt.pickle"), "--T", "3"],
        capture_output=True, text=True, timeout=2400, cwd=REPO)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert "PARITY OK" in proc.stdout


@pytest.mark.slow
def test_load_pretrained_pth_branch(real_ckpt, tmp_path):
    """apps.common.load_pretrained consumes the reference layout
    (opt.pickle + <name>.pth in the experiment dir) as the demos do."""
    exp_dir = tmp_path / "pretrained_aist"
    exp_dir.mkdir()
    shutil.copy(os.path.join(real_ckpt, "opt.pickle"),
                exp_dir / "opt.pickle")
    shutil.copy(os.path.join(real_ckpt, "epochs", "0", "network.pth"),
                exp_dir / "aist_pretrained.pth")

    import jax
    from neural_marionette_tpu.apps.common import load_pretrained

    ctx = load_pretrained(str(exp_dir), Ttot=3)
    assert ctx.cfg.nkeypoints == 24 and ctx.cfg.grid_size == 64
    g = np.random.default_rng(0)
    vox = (g.uniform(size=(1, 3, 64, 64, 64, 1)) < 0.02).astype(np.float32)
    det = ctx.model.apply(
        ctx.params, vox, affinity_active=True,
        method=lambda m, v, affinity_active:
        m.kypt_detector(v, affinity_active=affinity_active))
    kp = np.asarray(det["keypoints"])
    assert kp.shape == (1, 3, 24, 4)
    assert np.isfinite(kp).all()
    assert np.isfinite(np.asarray(det["recon"])).all()
