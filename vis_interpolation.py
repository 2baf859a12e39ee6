"""Motion interpolation demo CLI (reference vis_interpolation.py surface).

Anchors every ``anchor_rate`` frames of a 21-frame clip and fills the
in-between motion with prior rollouts selected to land near the anchors.
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
    parser.add_argument("--Ttot", type=int, default=21)
    parser.add_argument("--anchor_rate", type=int, default=10)
    parser.add_argument("--sample_num", type=int, default=10000,
                        help="parallel in-between rollouts (reference "
                             "uses 10000)")
    parser.add_argument("--seed", type=int, default=2)
    parser.add_argument("--out_dir", type=str,
                        default="output/demo/interpolation")
    parser.add_argument("--platform", type=str, default="",
                        help="force a JAX platform (e.g. cpu); the axon "
                             "TPU plugin ignores the JAX_PLATFORMS env var")
    args = parser.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from neural_marionette_tpu.apps.common import (load_pretrained,
                                                   load_clip, synthetic_clip)
    from neural_marionette_tpu.apps.interpolation import (run_interpolation,
                                                          save_outputs)

    np.random.seed(args.seed)
    ctx = load_pretrained(args.exp_dir, Ttot=args.Ttot)
    if os.path.exists(args.source_file):
        vox, _ = load_clip(args.source_file, ctx.cfg)
    else:
        print(f"{args.source_file} not found; using a synthetic clip")
        vox, _ = synthetic_clip(ctx.cfg, seed=args.seed)

    result = run_interpolation(ctx, vox, anchor_rate=args.anchor_rate,
                               sample_num=args.sample_num, seed=args.seed)
    save_outputs(result, args.out_dir, vox_clip=vox)
    print(f"wrote interpolation to {args.out_dir}")


if __name__ == "__main__":
    main()
