"""Produce a REAL torch-written reference checkpoint for round-trip tests.

Runs the UNMODIFIED reference trainer (`/root/reference/train.py`,
executed via runpy — no reference code is edited) on CPU against a
miniature AIST-layout fixture until it writes its first
``epochs/0/network.pth`` + ``opt.pickle`` (reference train.py:664-673).
The published pretrained blob is missing upstream
(.MISSING_LARGE_BLOBS), so this is the only way to obtain a checkpoint
the torch ``train.py`` actually wrote.

Wrapper-side compat shims (the container's torch/matplotlib are newer
than the reference's 2021 pins):
  * ``.cuda()`` -> identity (CPU-only container);
  * torchvision stub (imported by dataset.py, never used);
  * ``Arrow3D.do_3d_projection`` (new matplotlib 3D-artist API).

Usage: python scripts/make_reference_checkpoint.py WORKDIR [REFERENCE]
Writes WORKDIR/output/.../refckpt/{epochs/0/network.pth, opt.pickle};
prints the experiment dir on success.  Takes ~10 min on CPU (one
grid-64 torch train step + eval).
"""
import os
import sys
import types
import runpy


def main():
    workdir = os.path.abspath(sys.argv[1])
    reference = sys.argv[2] if len(sys.argv) > 2 else "/root/reference"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # miniature AIST-layout tree (tests/test_real_layout.py fixture)
    sys.path.insert(0, os.path.join(repo, "tests"))
    sys.path.insert(0, repo)
    from test_real_layout import _write_aist_tree
    os.makedirs(workdir, exist_ok=True)
    base = _write_aist_tree(os.path.join(workdir, "data_src"))
    os.makedirs(os.path.join(workdir, "data"), exist_ok=True)
    link = os.path.join(workdir, "data", "aist_plusplus_smpl_joints")
    if not os.path.exists(link):
        os.symlink(base, link)

    os.chdir(workdir)  # reference uses relative data/ and output/ paths

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

    exp = os.path.join(workdir, "output", "rl_setup", "disc_training",
                       "aist", "affinity_params", "24kypt", "refckpt")

    class _StopAfterSave(Exception):
        pass

    # stop as soon as the first checkpoint is on disk (nepoch is forced
    # to 200 by the reference's adjust_config; we only need epoch 0)
    orig_save = torch.save

    def save_and_stop(obj, path, *a, **k):
        orig_save(obj, path, *a, **k)
        if str(path).endswith("network.pth"):
            raise _StopAfterSave(str(path))
    torch.save = save_and_stop

    sys.argv = ["train.py", "--dataset", "aist", "--exp_name", "refckpt",
                "--debug", "1", "--nbatch", "2", "--seed", "0",
                "--save_every", "1", "--log_gif_every", "1000"]
    try:
        runpy.run_path(os.path.join(reference, "train.py"),
                       run_name="__main__")
    except _StopAfterSave as e:
        print(f"checkpoint written: {e}")
    finally:
        torch.save = orig_save

    pth = os.path.join(exp, "epochs", "0", "network.pth")
    assert os.path.exists(pth), f"no checkpoint at {pth}"
    assert os.path.exists(os.path.join(exp, "opt.pickle"))
    print(exp)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
