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


def _common_cli(tmp_path, port=None):
    cmd = [
        sys.executable, "train.py",
        "--dataset", "synthetic", "--apply_adjust_config", "0",
        "--platform", "cpu", "--output_root", str(tmp_path),
        "--exp_name", "mh", "--grid_size", "32", "--feat_dim", "32",
        "--nkeypoints", "6", "--Ttot", "4", "--Tcond", "2",
        "--nbatch", "4", "--n_points", "256", "--nlatent_kypt", "16",
        "--nhidden_kypt", "32", "--save_every", "1",
        "--log_gif_every", "100",
        "--num_workers", "2", "--detector_start", "0",
        "--learner_start", "0", "--affinity_anneal", "0",
    ]
    if port is not None:
        cmd += ["--coordinator_address", f"localhost:{port}",
                "--num_processes", "2"]
    return cmd


@pytest.mark.slow
def test_train_cli_two_processes_then_topology_change_resume(tmp_path):
    """Full train.py CLI across 2 jax.distributed processes x 2 devices
    each over a data:2 x model:2 mesh — frame-SP sharding active on a
    multi-process run — then RESUME the collectively-saved checkpoint
    single-process on 1 device (save-on-2-hosts / restore-on-1 topology
    change, VERDICT r3 #5)."""
    port = _free_port()
    env = dict(os.environ)
    # 2 CPU devices per process: the model (frame-SP) axis is active in
    # a multi-process topology (mesh_model=2); jit compile time (not
    # compute) dominates this test
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    common = _common_cli(tmp_path, port) + [
        "--nepoch", "1", "--mesh_data", "2", "--mesh_model", "2"]
    procs = [subprocess.Popen(common + ["--process_id", str(i)],
                              cwd=REPO, env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    # 2 procs x 2 virtual devices at mesh_model=2 compiles a much larger
    # program than the r3 1-device variant; measured 28 min for the epoch
    # under a fully loaded box, ~12 min alone
    outs = [p.communicate(timeout=4200)[0] for p in procs]
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

    # ---- topology change: restore the 2-process collective save on ONE
    # process with ONE device and train one more epoch
    env1 = dict(env)
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    resume = _common_cli(tmp_path) + [
        "--nepoch", "2", "--mesh_data", "1", "--mesh_model", "1"]
    out = subprocess.run(resume, cwd=REPO, env=env1,
                         stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True,
                         timeout=2400)
    assert out.returncode == 0, out.stdout[-3000:]
    assert "resumed from epoch 0" in out.stdout
    records = [json.loads(l) for l in
               open(os.path.join(exp, "metrics.jsonl"))]
    assert len(records) == 2 and records[1]["epoch"] == 1
    assert np.isfinite(records[1]["train"]["total_loss"])
    assert "1" in sorted(os.listdir(epochs))


@pytest.mark.slow
def test_model_axis_crosses_process_boundary(tmp_path):
    """Frame-SP (model-axis) collectives across a PROCESS boundary:
    2 processes x 1 device on a data:1 x model:2 mesh run the detector
    with the window's frame axis split between the processes, and the
    result must match an unsharded forward (VERDICT r3 #5a).  The CLI
    topology above keeps the model axis within a host (frame-SP belongs
    on ICI); this exercises the cross-host correctness of the same
    shardings."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    worker = os.path.join(REPO, "tests", "_mh_model_axis_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, f"localhost:{port}", str(i)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"rank {i} failed:\n{outs[i][-3000:]}"
    assert "MODEL_AXIS_OK" in outs[0]
