"""Motion retargeting demo CLI (reference vis_retarget.py surface).

Replays a source clip's motion on a target shape via the learned skeleton:
skinning weights from nearest bones, FK with target bone offsets + source
rotations, linear blend skinning.
"""
import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp_dir", type=str, default="pretrained/aist")
    parser.add_argument("--source_file", type=str,
                        default="data/demo/source/"
                                "gHO_sBM_cAll_d20_mHO1_ch05.npy")
    parser.add_argument("--target_file", type=str,
                        default="data/demo/target/ninja/target.obj")
    parser.add_argument("--Ttot", type=int, default=40)
    parser.add_argument("--hardness", type=float, default=8.0)
    parser.add_argument("--is_bind", type=int, default=0)
    parser.add_argument("--mode", type=str, default="ours",
                        choices=["ours", "baseline"])
    parser.add_argument("--target_scale", type=float, default=0.8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out_dir", type=str,
                        default="output/demo/retarget")
    parser.add_argument("--platform", type=str, default="",
                        help="force a JAX platform (e.g. cpu); the axon "
                             "TPU plugin ignores the JAX_PLATFORMS env var")
    args = parser.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from neural_marionette_tpu.apps.common import (load_pretrained,
                                                   load_clip, synthetic_clip)
    from neural_marionette_tpu.apps.retarget import (load_target_points,
                                                     run_retarget,
                                                     save_outputs)

    np.random.seed(args.seed)
    ctx = load_pretrained(args.exp_dir, Ttot=args.Ttot)
    if os.path.exists(args.source_file):
        source_vox, _ = load_clip(args.source_file, ctx.cfg)
    else:
        print(f"{args.source_file} not found; using a synthetic clip")
        source_vox, _ = synthetic_clip(ctx.cfg, seed=args.seed)

    target_mesh = None
    if os.path.exists(args.target_file):
        target_points, target_mesh = load_target_points(
            args.target_file, scale=args.target_scale,
            is_bind=bool(args.is_bind), return_mesh=True)
    else:
        print(f"{args.target_file} not found; using a synthetic target")
        vox, pts = synthetic_clip(ctx.cfg, seed=args.seed + 7)
        target_points = pts[0]

    out = run_retarget(ctx, source_vox, target_points,
                       hardness=args.hardness, mode=args.mode,
                       seed=args.seed)
    save_outputs(out, args.out_dir, source_vox=source_vox,
                 target_mesh=target_mesh, target_points=target_points)
    print(f"wrote retargeted motion to {args.out_dir}")


if __name__ == "__main__":
    main()
