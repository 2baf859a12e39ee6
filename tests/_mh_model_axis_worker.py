"""Worker for test_model_axis_crosses_process_boundary.

2 jax.distributed processes x 1 CPU device, mesh data:1 x model:2 — the
frame (sequence-parallel) axis spans the PROCESS boundary, so the
detector's per-frame conv encoder runs half the window on each process
and the keypoint gather for the sequential VRNN is a cross-process
allgather.  (The product topology keeps the model axis within a host —
frame-SP traffic belongs on ICI, data-parallel on DCN — but the
collectives must still be correct when a mesh crosses hosts.)

Run: python tests/_mh_model_axis_worker.py <coordinator> <rank>
Prints "MODEL_AXIS_OK <loss>" on success (rank 0).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"


def main():
    coordinator, rank = sys.argv[1], int(sys.argv[2])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=2, process_id=rank)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from neural_marionette_tpu.config import MarionetteConfig
    from neural_marionette_tpu.models import KyptDetector
    from neural_marionette_tpu.parallel.mesh import make_mesh
    from neural_marionette_tpu.parallel.distributed import warmup_collectives

    cfg = MarionetteConfig(
        grid_size=32, nkeypoints=6, input_dim=3, Ttot=4, Tcond=2,
        nlatent_kypt=16, nhidden_kypt=32, const_intensity=3,
        affinity_ver=3, nneighbor=2, feat_dim=32, dataset="synthetic")
    mesh = make_mesh(data=1, model=2)
    assert mesh.devices.shape == (1, 2)
    # the two model-axis devices belong to DIFFERENT processes
    procs = {d.process_index for d in mesh.devices.ravel()}
    assert procs == {0, 1}, procs
    warmup_collectives(mesh)

    B, T, G = 2, cfg.Ttot, cfg.grid_size
    g = np.random.default_rng(0)
    vox_global = (g.random((B, T, G, G, G, 1)) < 0.05).astype(np.float32)
    # each process contributes its local HALF of the frame axis
    half = T // 2
    local = vox_global[:, rank * half:(rank + 1) * half]
    sharding = NamedSharding(mesh, P(None, "model"))
    vox = jax.make_array_from_process_local_data(sharding, local)

    det = KyptDetector(cfg)
    host_params = det.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 2, G, G, G, 1)))
    host_params = jax.tree.map(np.asarray, host_params)
    params = jax.device_put(host_params, NamedSharding(mesh, P()))

    @jax.jit
    def fwd(p, v):
        out = det.apply(p, v)
        return out["recon_loss"], out["keypoints"]

    loss, kp = fwd(params, vox)
    loss = float(loss)
    # replicate the sharded keypoints so each process holds the full value
    rep = jax.jit(lambda x: x,
                  out_shardings=NamedSharding(mesh, P()))(kp)
    kp = np.asarray(rep.addressable_data(0))
    assert np.isfinite(loss)
    assert np.isfinite(kp).all()
    assert kp.shape == (B, T, cfg.nkeypoints, 4)

    # differential vs a process-local unsharded forward of the SAME
    # inputs (frames are what's sharded; results must agree)
    local_out = det.apply(host_params, jnp.asarray(vox_global))
    np.testing.assert_allclose(kp, np.asarray(local_out["keypoints"]),
                               rtol=1e-4, atol=1e-4)
    if rank == 0:
        print(f"MODEL_AXIS_OK {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
