"""Measure the PyTorch reference's throughput on the BASELINE workload.

Runs the unmodified reference code (read-only, from /root/reference) on CPU
— the only hardware it can use here — timing the north-star workload:
64^3 x T voxel-sequence encode (kypt_detector forward) + VRNN rollout
(hsvrnn_bvh encode).  The resulting seqs/sec constant is recorded in
BASELINE.md and used by bench.py as the vs_baseline denominator.

Usage: python scripts/measure_reference.py [B] [T] [iters]
"""
import pickle
import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np
import torch

torch.manual_seed(0)
np.random.seed(0)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    with open("/root/reference/pretrained/aist/opt.pickle", "rb") as f:
        opt = pickle.load(f)
    opt.Ttot = T

    from model.neural_marionette import NeuralMarionette

    net = NeuralMarionette(opt)
    net.eval()
    net.anneal(1)  # enable affinity (required: vis_generation.py:69)
    G = opt.grid_size
    vox = (torch.rand(B, T, 1, G, G, G) < 0.02).float()
    actives = {"detector": True, "learner": True}

    with torch.no_grad():
        t0 = time.perf_counter()
        net(vox, actives)  # warmup (also caches the skeleton)
        warm = time.perf_counter() - t0
        print(f"warmup: {warm:.2f}s", flush=True)

        t0 = time.perf_counter()
        for _ in range(iters):
            net(vox, actives)
        dt = (time.perf_counter() - t0) / iters

    seqs_per_sec = B / dt
    nparams = sum(p.numel() for p in net.parameters())
    print(f"reference PyTorch CPU: B={B} T={T} G={G} K={opt.nkeypoints} "
          f"params={nparams/1e6:.2f}M")
    print(f"encode+rollout: {dt:.3f}s/batch -> {seqs_per_sec:.4f} seqs/sec")


if __name__ == "__main__":
    main()
