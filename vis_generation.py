"""Motion generation demo CLI (reference vis_generation.py surface).

Loads pretrained weights (our Orbax layout or the reference's
pretrained/aist .pth via the converter), conditions on 5 frames of the demo
clip, rolls out 25 prior steps x sample_num trajectories, decodes voxels,
and writes GIFs + .npy outputs under output/demo/generation.

Falls back to a synthetic clip when the demo .npy is absent (it is a
missing large blob in the reference mount as well).
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
    parser.add_argument("--Tcond", type=int, default=5)
    parser.add_argument("--Tgen", type=int, default=25)
    parser.add_argument("--sample_num", type=int, default=3)
    parser.add_argument("--seed", type=int, default=2)
    parser.add_argument("--out_dir", type=str,
                        default="output/demo/generation")
    parser.add_argument("--platform", type=str, default="",
                        help="force a JAX platform (e.g. cpu); the axon "
                             "TPU plugin ignores the JAX_PLATFORMS env var")
    args = parser.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from neural_marionette_tpu.apps.common import (load_pretrained,
                                                   load_clip, synthetic_clip)
    from neural_marionette_tpu.apps.generation import (run_generation,
                                                       save_outputs)

    np.random.seed(args.seed)
    ctx = load_pretrained(args.exp_dir, Ttot=args.Tcond)
    if os.path.exists(args.source_file):
        vox, _ = load_clip(args.source_file, ctx.cfg)
    else:
        print(f"{args.source_file} not found; using a synthetic clip")
        vox, _ = synthetic_clip(ctx.cfg, seed=args.seed)

    result = run_generation(ctx, vox, Tcond=args.Tcond, Tgen=args.Tgen,
                            sample_num=args.sample_num, seed=args.seed)
    save_outputs(result, args.out_dir, vox_cond=vox[:args.Tcond],
                 Tcond=args.Tcond)
    print(f"wrote {args.sample_num} generated motions to {args.out_dir}")


if __name__ == "__main__":
    main()
