"""Verify a reference PyTorch checkpoint against this framework.

Given a reference `.pth` (e.g. the published pretrained/aist blob, which is
missing from this mount) + its `opt.pickle`, this converts the weights,
runs both models on the same voxel clip, and reports keypoint /
reconstruction deltas — the user-run version of
tests/test_reference_parity.py for real checkpoints.

Usage:
  python scripts/verify_reference_checkpoint.py \
      --ckpt pretrained/aist/aist_pretrained.pth \
      --opt pretrained/aist/opt.pickle \
      [--reference_repo /root/reference] [--clip data/demo/... .npy]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--opt", required=True)
    parser.add_argument("--reference_repo", default="/root/reference")
    parser.add_argument("--clip", default=None,
                        help=".npy point clip; random voxels if absent")
    parser.add_argument("--T", type=int, default=5)
    args = parser.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # exact fp32 comparison
    import jax.numpy as jnp
    import torch

    from neural_marionette_tpu.config import load_reference_pickle
    from neural_marionette_tpu.models import NeuralMarionette, SkeletonArrays
    from neural_marionette_tpu.skeleton import extract_skeleton
    from neural_marionette_tpu.utils.torch_convert import \
        load_reference_checkpoint

    cfg = load_reference_pickle(args.opt).replace(Ttot=args.T)
    params = load_reference_checkpoint(args.ckpt)
    model = NeuralMarionette(cfg)

    # input clip
    if args.clip and os.path.exists(args.clip):
        from neural_marionette_tpu.apps.common import load_clip
        vox, _ = load_clip(args.clip, cfg)
        vox = vox[None]
    else:
        g = np.random.default_rng(0)
        G = cfg.grid_size
        vox = (g.uniform(size=(1, args.T, G, G, G, 1)) < 0.02).astype(
            np.float32)

    ours = model.apply(params, jnp.asarray(vox), affinity_active=True,
                       method=lambda m, v, affinity_active:
                       m.kypt_detector(v, affinity_active=affinity_active))
    kp = np.asarray(ours["keypoints"])
    print(f"our keypoints: {kp.shape}, intensity range "
          f"[{kp[..., 3].min():.3f}, {kp[..., 3].max():.3f}]")
    sk = extract_skeleton(np.asarray(ours["affinity"]))
    print(f"skeleton parents: {sk.parents.tolist()}")

    # torch side
    sys.path.insert(0, args.reference_repo)
    import pickle
    with open(args.opt, "rb") as f:
        opt = pickle.load(f)
    opt.Ttot = args.T
    from model.neural_marionette import NeuralMarionette as RefNM
    net = RefNM(opt)
    net.load_state_dict(torch.load(args.ckpt, map_location="cpu"))
    net.eval()
    net.anneal(1)
    with torch.no_grad():
        ref = net.kypt_detector(
            torch.from_numpy(np.moveaxis(vox, -1, 2)))

    kp_ref = ref["keypoints"].numpy()
    recon_ref = ref["recon"].numpy()
    recon = np.moveaxis(np.asarray(ours["recon"]), -1, 2)
    print(f"keypoint max |delta|: {np.abs(kp - kp_ref).max():.2e}")
    print(f"recon    max |delta|: {np.abs(recon - recon_ref).max():.2e}")
    ok = np.abs(kp - kp_ref).max() < 1e-3 \
        and np.abs(recon - recon_ref).max() < 1e-3
    print("PARITY OK" if ok else "PARITY FAILED (>1e-3)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
