"""Training-DYNAMICS parity vs the unmodified torch reference.

Single-forward parity is proven elsewhere (tests/test_reference_parity.py);
this closes VERDICT r3 #4: do the optimizer / staged-LR / loss-weight
semantics match over EPOCHS?

Protocol (both sides CPU, identical fixture data, identical weights):
  1. run the UNMODIFIED reference trainer (/root/reference/train.py via
     runpy, same shims as make_reference_checkpoint.py) for NEPOCH epochs
     on a miniature AIST-layout tree with --random_crop 0 (deterministic
     windows) and --debug 1 --nbatch 2 (one 2-sequence batch per epoch);
     capture its per-epoch LOGGER means via an add_scalar intercept and
     its epoch-0 checkpoint;
  2. convert the epoch-0 ``network.pth`` with utils.torch_convert, write
     it as OUR epoch-0 Orbax checkpoint (fresh Adam moments — exactly the
     reference's state at the epoch-1 boundary, since it re-creates Adam
     every epoch, reference train.py:366-374);
  3. run OUR train.py CLI with the matching flags (+ --opt_reset_per_epoch
     1 to replicate the fresh-Adam semantics and --max_grad_norm 1e9 to
     replicate the reference's dead clip call) — it auto-resumes from the
     converted checkpoint and trains epochs 1..NEPOCH-1;
  4. compare per-epoch per-loss means and write PARITY_DYNAMICS.json.

Epoch-1 losses are computed BEFORE any of our updates, from identical
weights on identical windows, so the deterministic detector-side losses
must agree tightly; the VRNN-side losses (kypt_recon, kl_kypt) and every
epoch>=2 value carry reparametrization-sampling noise (torch RNG vs JAX
RNG) and get looser tolerances.

Usage: python scripts/parity_train_dynamics.py WORKDIR [NEPOCH=3]
Takes ~40-70 min on CPU (torch reference epochs + one XLA grid-64
compile).  Results recorded in PARITY.md.
"""
from __future__ import annotations

import json
import os
import runpy
import subprocess
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# loss names both frameworks record (reference LOSS_LIST keys == ours)
COMPARE_LOSSES = [
    "recon_loss", "sparsity_loss", "separation_loss", "vol_fit_reg",
    "local_const_loss", "time_const_loss", "sparsity_const_loss",
    "graph_traj_loss", "kypt_recon_loss", "kl_kypt",
]
STOCHASTIC = {"kypt_recon_loss", "kl_kypt"}


def run_reference(workdir: str, nepoch: int, reference: str):
    """Phase 1: reference trainer for ``nepoch`` epochs; returns
    (exp_dir, {epoch: {loss: value}})."""
    import torch
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    tv = types.ModuleType("torchvision")
    tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv.transforms

    sys.path.insert(0, reference)
    import utils.vis_utils as vu
    from mpl_toolkits.mplot3d import proj3d

    def do_3d_projection(self, renderer=None):
        xs3d, ys3d, zs3d = self._verts3d
        xs, ys, zs = proj3d.proj_transform(xs3d, ys3d, zs3d, self.axes.M)
        self.set_positions((xs[0], ys[0]), (xs[1], ys[1]))
        return min(zs)
    vu.Arrow3D.do_3d_projection = do_3d_projection

    scalars: dict[int, dict[str, float]] = {}
    from torch.utils.tensorboard import SummaryWriter
    orig_add_scalar = SummaryWriter.add_scalar

    def add_scalar(self, tag, value, step=None, *a, **k):
        if tag.startswith("train/"):
            scalars.setdefault(int(step), {})[tag[6:]] = float(value)
        return orig_add_scalar(self, tag, value, step, *a, **k)
    SummaryWriter.add_scalar = add_scalar

    class _Done(Exception):
        pass

    saves = {"n": 0}
    orig_save = torch.save

    def save_and_count(obj, path, *a, **k):
        orig_save(obj, path, *a, **k)
        if str(path).endswith("network.pth"):
            saves["n"] += 1
            if saves["n"] >= nepoch:
                raise _Done(str(path))
    torch.save = save_and_count

    sys.argv = ["train.py", "--dataset", "aist", "--exp_name", "dynref",
                "--debug", "1", "--nbatch", "2", "--seed", "0",
                "--random_crop", "0", "--save_every", "1"]
    try:
        runpy.run_path(os.path.join(reference, "train.py"),
                       run_name="__main__")
    except _Done:
        pass
    finally:
        torch.save = orig_save
        SummaryWriter.add_scalar = orig_add_scalar

    exp = os.path.join(workdir, "output", "rl_setup", "disc_training",
                       "aist", "affinity_params", "24kypt", "dynref")
    assert os.path.exists(os.path.join(exp, "epochs", "0", "network.pth"))
    assert len(scalars) >= nepoch, f"captured epochs: {sorted(scalars)}"
    return exp, scalars


def seed_our_checkpoint(workdir: str, ref_exp: str):
    """Phase 2: converted epoch-0 reference weights -> our Orbax epoch-0
    checkpoint at the logger path our CLI will derive."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from neural_marionette_tpu.config import (MarionetteConfig,
                                              adjust_config,
                                              derive_training_id)
    from neural_marionette_tpu.train import create_train_state
    from neural_marionette_tpu.train.checkpoint import CheckpointManager
    from neural_marionette_tpu.utils.torch_convert import \
        load_reference_checkpoint

    cfg = derive_training_id(adjust_config(MarionetteConfig(
        dataset="aist", exp_name="dyntpu", debug=1, nbatch=2, seed=0,
        random_crop=0, data_root=os.path.join(workdir, "data"),
        output_root=os.path.join(workdir, "output_tpu"))))
    params = load_reference_checkpoint(
        os.path.join(ref_exp, "epochs", "0", "network.pth"))
    params = jax.tree.map(jnp.asarray, params)
    state = create_train_state(cfg, params, jax.random.PRNGKey(cfg.seed + 2))
    logger_path = os.path.join(cfg.output_root, cfg.training_id,
                               cfg.exp_name)
    os.makedirs(logger_path, exist_ok=True)
    CheckpointManager(logger_path, cfg.save_que_len).save(0, state)
    return logger_path


def run_ours(workdir: str, nepoch: int) -> dict[int, dict[str, float]]:
    """Phase 3: our CLI resumes the seeded checkpoint, trains epochs
    1..nepoch-1; returns per-epoch train means from metrics.jsonl."""
    cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--dataset", "aist", "--exp_name", "dyntpu", "--platform", "cpu",
        "--debug", "1", "--nbatch", "2", "--seed", "0",
        "--random_crop", "0", "--save_every", "1",
        "--data_root", os.path.join(workdir, "data"),
        "--output_root", os.path.join(workdir, "output_tpu"),
        "--nepoch", str(nepoch), "--num_workers", "0",
        "--n_points", "300",              # ship every fixture point
        "--opt_reset_per_epoch", "1",     # reference fresh-Adam semantics
        "--max_grad_norm", "1e9",         # reference clip call is dead code
        "--log_gif_every", "1000",
    ]
    out = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                         timeout=7200)
    sys.stdout.write(out.stdout[-2000:])
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-4000:]
    assert "resumed from epoch 0" in out.stdout

    metrics = None
    for root, _, files in os.walk(os.path.join(workdir, "output_tpu")):
        if "metrics.jsonl" in files:
            metrics = os.path.join(root, "metrics.jsonl")
    assert metrics, "no metrics.jsonl"
    ours = {}
    for line in open(metrics):
        row = json.loads(line)
        ours[int(row["epoch"])] = row["train"]
    return ours


def main():
    workdir = os.path.abspath(sys.argv[1])
    nepoch = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    reference = sys.argv[3] if len(sys.argv) > 3 else "/root/reference"

    from test_real_layout import _write_aist_tree
    os.makedirs(workdir, exist_ok=True)
    # >= Ttot*sample_rate = 20 frames: the reference's
    # deterministic-crop arithmetic (dataset.py:137) divides by
    # n_windows and zero-crashes on shorter sequences
    base = _write_aist_tree(os.path.join(workdir, 'data_src'),
                            n_frames=44)
    os.makedirs(os.path.join(workdir, "data"), exist_ok=True)
    link = os.path.join(workdir, "data", "aist_plusplus_smpl_joints")
    if not os.path.exists(link):
        os.symlink(base, link)
    os.chdir(workdir)  # reference uses relative data/ + output/ paths

    ref_exp, ref = run_reference(workdir, nepoch, reference)
    logger_path = seed_our_checkpoint(workdir, ref_exp)
    print(f"seeded converted checkpoint at {logger_path}")
    ours = run_ours(workdir, nepoch)

    report = {"nepoch": nepoch, "epochs": {}}
    worst_det, worst_sto = 0.0, 0.0
    for e in range(1, nepoch):
        row = {}
        for name in COMPARE_LOSSES:
            r, o = ref[e].get(name), ours[e].get(name)
            if r is None or o is None:
                continue
            rel = abs(o - r) / max(abs(r), 1e-6)
            row[name] = {"ref": r, "ours": o, "rel": round(rel, 4)}
            if name in STOCHASTIC:
                worst_sto = max(worst_sto, rel)
            else:
                worst_det = max(worst_det, rel)
        report["epochs"][e] = row
    report["worst_rel_deterministic"] = round(worst_det, 4)
    report["worst_rel_stochastic"] = round(worst_sto, 4)

    out_path = os.path.join(workdir, "PARITY_DYNAMICS.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print(f"written: {out_path}")
    # epoch-1 evaluates converted-identical weights on identical windows:
    # deterministic losses must track; later epochs accumulate one
    # VRNN-sampling-noise update of drift
    ok = worst_det < 0.25
    print("PARITY DYNAMICS", "OK" if ok else "FAIL",
          f"(worst deterministic rel {worst_det:.4f}, "
          f"stochastic rel {worst_sto:.4f})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
