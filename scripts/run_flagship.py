"""Flagship two-phase training schedule, end-to-end on hardware.

Drives the exact product the reference exists for (reference
train.py:141-158,350-674 + dataset/config.py:35-53): a detector phase to a
converged affinity, then a dynamics phase (`pretrained_mode=1`) from that
checkpoint, then all three demo CLIs from the final checkpoint.

Uses the synthetic articulated-chain dataset at the flagship AIST++ shapes
(K=24, G=64, B=24, T=10 -> 20, lr 4e-4 staged at 60/140) because the real
AIST++ raw data cannot be downloaded in this container.

Run:  python scripts/run_flagship.py [--nepoch 160] [--sequences 256]
Artifacts land under output/ and output/demo/; a summary JSON is written
to output/flagship_summary.json for BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PHASE1_ID = "rl_setup/disc_training/synthetic/affinity_params/24kypt"
PHASE2_ID = ("rl_setup/dyna_training/synthetic/dl/HSVRNNBVH/24kypt/"
             "128zkypt_512hkypt")

COMMON = [
    "--dataset", "synthetic", "--apply_adjust_config", "0",
    "--nkeypoints", "24", "--grid_size", "64",
    "--sample_rate", "2", "--random_crop", "1", "--is_eval", "1",
    "--lrate", "4e-4", "--nbatch", "24", "--compute_dtype", "bfloat16",
    "--log_gif_num", "4", "--save_every", "1", "--seed", "0",
]


def run_phase(name: str, extra: list[str], log_path: str) -> float:
    cmd = [sys.executable, os.path.join(REPO, "train.py")] + COMMON + extra
    print(f"[flagship] {name}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    with open(log_path, "w") as log:
        rc = subprocess.call(cmd, cwd=REPO, stdout=log,
                             stderr=subprocess.STDOUT)
    dt = time.time() - t0
    if rc != 0:
        with open(log_path) as f:
            tail = f.readlines()[-40:]
        sys.stderr.write("".join(tail))
        raise SystemExit(f"{name} failed rc={rc} after {dt:.0f}s "
                         f"(log: {log_path})")
    print(f"[flagship] {name} done in {dt / 60:.1f} min", flush=True)
    return dt


def latest_epoch_dir(logger_path: str) -> str:
    root = os.path.join(logger_path, "epochs")
    epochs = sorted(int(d) for d in os.listdir(root) if d.isdigit())
    return os.path.join(root, str(epochs[-1])), epochs[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nepoch", type=int, default=160)
    ap.add_argument("--sequences", type=int, default=256)
    ap.add_argument("--exp_name", type=str, default="flagship_r5")
    ap.add_argument("--skip_phase1", action="store_true")
    ap.add_argument("--skip_phase2", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU end-to-end rehearsal of the exact "
                         "orchestration path (grid 32, 2 epochs)")
    args = ap.parse_args()

    if args.smoke:
        global COMMON
        args.nepoch, args.sequences = 2, 8
        args.exp_name += "_smoke"
        COMMON[COMMON.index("--grid_size") + 1] = "32"
        COMMON[COMMON.index("--nbatch") + 1] = "4"
        COMMON = COMMON + ["--feat_dim", "32", "--platform", "cpu",
                           "--num_workers", "0"]

    out = os.path.join(REPO, "output")
    os.makedirs(out, exist_ok=True)
    summary = {"nepoch": args.nepoch, "sequences": args.sequences}
    scale = ["--synthetic_sequences", str(args.sequences),
             "--synthetic_seq_len", "60",
             "--exp_name", args.exp_name]

    p1_logger = os.path.join(out, PHASE1_ID, args.exp_name)
    p2_logger = os.path.join(out, PHASE2_ID, args.exp_name)

    # ---- phase 1: detector training (reference disc_training)
    if not args.skip_phase1:
        summary["phase1_sec"] = run_phase(
            "phase1-detector",
            scale + ["--pretrained_mode", "0",
                     "--Ttot", "10", "--Tcond", "3",
                     "--nepoch", str(args.nepoch),
                     "--firstdecay", "60", "--seconddecay", "140",
                     "--grad_accum", "2", "--remat", "0",
                     "--log_gif_every", "25"],
            os.path.join(out, "flagship_phase1.log"))

    # ---- export detector for pretrained_mode=1 (reference train.py:270-278
    # reads pretrained/<dataset>_detector; ours reads an Orbax epoch dir)
    src, ep = latest_epoch_dir(p1_logger)
    pre = os.path.join(REPO, "pretrained", "detector", "synthetic_detector",
                       "epochs", str(ep))
    if os.path.isdir(os.path.dirname(pre)):
        shutil.rmtree(os.path.dirname(pre))
    os.makedirs(os.path.dirname(pre), exist_ok=True)
    shutil.copytree(src, pre)
    summary["detector_epoch"] = ep
    print(f"[flagship] exported detector epoch {ep} -> {pre}", flush=True)

    # ---- phase 2: dynamics training from the pretrained detector
    if not args.skip_phase2:
        summary["phase2_sec"] = run_phase(
            "phase2-dynamics",
            scale + ["--pretrained_mode", "1",
                     "--Ttot", "20", "--Tcond", "5",
                     "--nepoch", str(args.nepoch),
                     # reference pins lr constant in dyna training
                     # (dataset/config.py: firstdecay=seconddecay=1e10)
                     "--firstdecay", str(10**9),
                     "--seconddecay", str(10**9),
                     # microbatch 6 seqs x 20 frames = 120 folded frames:
                     # the measured remat-free memory ceiling (BASELINE.md)
                     "--grad_accum", "4", "--remat", "0",
                     "--log_gif_every", "25"],
            os.path.join(out, "flagship_phase2.log"))

    # ---- demo clip: raw (unnormalized) synthetic points, long enough for
    # the retarget demo's 40-frame window at sample_rate 2
    from neural_marionette_tpu.config import MarionetteConfig
    from neural_marionette_tpu.data.datasets import Synthetic
    demo_dir = os.path.join(REPO, "data", "demo", "source")
    os.makedirs(demo_dir, exist_ok=True)
    cfg = MarionetteConfig(dataset="synthetic", nkeypoints=24)
    ds = Synthetic(train=False, options=cfg, n_sequences=2, seq_len=120)
    import numpy as np
    pts, _ = ds._generate(10_000)
    np.save(os.path.join(demo_dir, "flagship_demo.npy"),
            pts.astype("float32"))
    # retarget target = a STATIC shape (N, 3), reference vis_retarget
    # semantics (a rest-pose mesh / scan, not a motion clip)
    tgt, _ = ds._generate(10_001)
    np.save(os.path.join(demo_dir, "flagship_target.npy"),
            tgt[0].astype("float32"))
    src_clip = os.path.join(demo_dir, "flagship_demo.npy")
    tgt_clip = os.path.join(demo_dir, "flagship_target.npy")

    # ---- the three demo CLIs from the final checkpoint
    plat = ["--platform", "cpu"] if args.smoke else []
    demos = {
        "generation": [sys.executable, "vis_generation.py",
                       "--exp_dir", p2_logger, "--source_file", src_clip,
                       "--out_dir", "output/demo/generation"] + plat,
        "interpolation": [sys.executable, "vis_interpolation.py",
                          "--exp_dir", p2_logger, "--source_file", src_clip,
                          "--out_dir", "output/demo/interpolation"] + plat
                         + (["--sample_num", "64"] if args.smoke else []),
        "retarget": [sys.executable, "vis_retarget.py",
                     "--exp_dir", p2_logger, "--source_file", src_clip,
                     "--target_file", tgt_clip,
                     "--out_dir", "output/demo/retarget"] + plat,
    }
    for name, cmd in demos.items():
        log_path = os.path.join(out, f"flagship_demo_{name}.log")
        print(f"[flagship] demo {name}", flush=True)
        with open(log_path, "w") as log:
            rc = subprocess.call(cmd, cwd=REPO, stdout=log,
                                 stderr=subprocess.STDOUT)
        summary[f"demo_{name}"] = "ok" if rc == 0 else f"rc={rc}"

    # ---- summary: final losses + semantic score + skeleton
    for phase, logger in (("phase1", p1_logger), ("phase2", p2_logger)):
        mfile = os.path.join(logger, "metrics.jsonl")
        if os.path.exists(mfile):
            with open(mfile) as f:
                lines = [json.loads(l) for l in f if l.strip()]
            if lines:
                summary[f"{phase}_final"] = lines[-1]
        sem = os.path.join(logger, "semantic_result.csv")
        if os.path.exists(sem):
            summary[f"{phase}_semantic_csv"] = sem
    _, ep2 = latest_epoch_dir(p2_logger)
    meta = os.path.join(p2_logger, "epochs", str(ep2), "meta.json")
    with open(meta) as f:
        summary["skeleton_parents"] = json.load(f).get(
            "skeleton", {}).get("parents")

    with open(os.path.join(out, "flagship_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2), flush=True)


if __name__ == "__main__":
    main()
