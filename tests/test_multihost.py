"""Multi-host integration: 2 jax.distributed processes over localhost.

SURVEY §5 "Distributed communication backend": per-host data loading,
global batches assembled via jax.make_array_from_process_local_data, XLA
collectives over the (data, model) mesh, coordinator-only logging and
checkpointing.  The reference has no distributed layer at all (§2.7);
this is the green-field TPU design, validated on CPU with gloo.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_train_cli_two_processes(tmp_path):
    """Full train.py CLI across 2 jax.distributed processes: per-host
    batch slices over a data:2 mesh, collective checkpoint save,
    eval/gif allgather path, coordinator-only logging."""
    port = _free_port()
    env = dict(os.environ)
    # 1 CPU device per process: jit compile time (not compute) dominates
    # this test; the 8-device frame-SP mesh variant is covered
    # single-process by test_parallel.py
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_PLATFORMS", None)
    common = [
        sys.executable, "train.py",
        "--dataset", "synthetic", "--apply_adjust_config", "0",
        "--platform", "cpu", "--output_root", str(tmp_path),
        "--exp_name", "mh", "--grid_size", "32", "--feat_dim", "32",
        "--nkeypoints", "6", "--Ttot", "4", "--Tcond", "2",
        "--nbatch", "4", "--n_points", "256", "--nlatent_kypt", "16",
        "--nhidden_kypt", "32", "--nepoch", "1", "--save_every", "1",
        "--log_gif_every", "100", "--mesh_data", "2", "--mesh_model", "1",
        "--num_workers", "2", "--detector_start", "0",
        "--learner_start", "0", "--affinity_anneal", "0",
        "--coordinator_address", f"localhost:{port}",
        "--num_processes", "2",
    ]
    procs = [subprocess.Popen(common + ["--process_id", str(i)],
                              cwd=REPO, env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=2400)[0] for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"rank {i} failed:\n{outs[i][-3000:]}"

    exp = None
    for root, dirs, files in os.walk(tmp_path):
        if "metrics.jsonl" in files:
            exp = root
    assert exp, "no metrics.jsonl written"
    records = [json.loads(l) for l in
               open(os.path.join(exp, "metrics.jsonl"))]
    assert len(records) == 1  # coordinator-only logging, one per epoch
    for r in records:
        assert np.isfinite(r["train"]["total_loss"])
        assert np.isfinite(r["valid"]["total_loss"])
    # collective checkpoint written with restorable metadata
    epochs = os.path.join(exp, "epochs")
    assert "0" in sorted(os.listdir(epochs))
    assert os.path.exists(os.path.join(epochs, "0", "meta.json"))
    # both ranks ran to completion through the same epochs (replicated
    # loss scalars print on both; rank 1 must not have crashed silently)
    assert "training complete" in outs[0]
