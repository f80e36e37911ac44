"""Worker for the 2-process CPU jax.distributed test (test_multihost.py).

Each process owns 2 virtual CPU devices; together they form a global
(data=2, gauss=2) mesh. Runs one sharded train step, prints the loss and a
parameter checksum, and exercises checkpoint save (process 0) + load (both).
Launched with: python multihost_worker.py <coordinator> <num_procs> <pid> <tmpdir>
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
os.environ["PALLAS_AXON_POOL_IPS"] = ""

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, num_procs, pid, tmpdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    from ex4dgs_tpu.runtime.distributed import (
        host_consistent_seed, initialize, shard_cameras_for_host)

    info = initialize(coordinator_address=coordinator,
                      num_processes=num_procs, process_id=pid)
    assert info["process_count"] == num_procs, info
    assert info["global_devices"] == 2 * num_procs, info

    import math

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ex4dgs_tpu.models import ModelConfig, OptimizationConfig, create_from_pcd
    from ex4dgs_tpu.models.optimizer import init_state
    from ex4dgs_tpu.ops.math3d import projection_matrix, world_to_view
    from ex4dgs_tpu.parallel.step_dp import make_sharded_train_step
    from ex4dgs_tpu.rendering import RenderCamera
    from ex4dgs_tpu.train.step import StepStatics

    # identical deterministic scene on every host
    rng = host_consistent_seed(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32) * 0.8
    cols = rng.uniform(0.1, 0.9, size=(100, 3)).astype(np.float32)
    cfg = ModelConfig(time_interval=5, start_duration=5, duration=10,
                      near=0.2, far=50.0)
    model = create_from_pcd(pts, cols, cfg, duration=5, static_capacity=128)
    state = init_state(model.params)

    W, H = 48, 32
    view = world_to_view(np.eye(3), np.array([0, 0, 4.0], np.float32))
    fov = math.radians(60)
    Pm = projection_matrix(0.2, 50.0, fov, fov)
    cam = RenderCamera.from_fov(view, Pm @ view, np.linalg.inv(view)[:3, 3],
                                W, H, fov, fov)

    devices = np.array(jax.devices()).reshape(2, 2)
    mesh = Mesh(devices, ("data", "gauss"))
    statics = StepStatics(cfg=cfg, opt=OptimizationConfig(),
                          spatial_lr_scale=1.0, capacity=4096, chunk=64,
                          max_per_tile=256)
    step = make_sharded_train_step(statics, mesh)

    # global batch of 2 cameras: each PROCESS contributes its local rows
    cams_all = [cam, cam]
    local_cams = shard_cameras_for_host(cams_all, 2)
    assert len(local_cams) == 1
    gt = np.zeros((H, W, 3), np.float32)

    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("data"))

    def to_global(local, sharding):
        return jax.make_array_from_process_local_data(sharding, local)

    cams_b = jax.tree.map(
        lambda *xs: to_global(np.stack([np.asarray(x) for x in xs]), dsh),
        *[c for c in local_cams],
    )
    gts = to_global(np.stack([gt] * len(local_cams)), dsh)
    ts = to_global(np.full((len(local_cams),), 1.0, np.float32), dsh)

    model_g = jax.tree.map(
        lambda a: to_global(np.asarray(a), repl)
        if hasattr(a, "shape") else a, model)
    state_g = jax.tree.map(lambda a: to_global(np.asarray(a), repl), state)

    out = step(model_g, state_g, cams_b, gts,
               ts, to_global(np.zeros(3, np.float32), repl),
               to_global(np.asarray(600, np.int32), repl))
    loss = float(out.loss)
    xyz = np.asarray(jax.device_get(out.model.params["xyz"]))
    checksum = float(np.abs(xyz).sum())
    assert np.isfinite(loss) and np.isfinite(checksum)

    # checkpoint: host 0 saves; everyone loads the identical state back
    from ex4dgs_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from ex4dgs_tpu.models.density import pull

    ckpt = os.path.join(tmpdir, "mh_ckpt.npz")
    host_model = jax.tree.map(lambda a: jax.device_get(a), out.model)
    host_state = jax.tree.map(lambda a: jax.device_get(a), out.opt_state)
    if jax.process_index() == 0:
        hm = pull(host_model, host_state)
        save_checkpoint(ckpt, hm, 1)
    import jax.experimental.multihost_utils as mh

    mh.sync_global_devices("ckpt_written")
    hm2, it2, _ = load_checkpoint(ckpt)
    resumed = float(np.abs(hm2.params["xyz"]).sum())

    print(f"RESULT pid={pid} loss={loss:.6f} checksum={checksum:.4f} "
          f"resumed={resumed:.4f} it={it2}", flush=True)


if __name__ == "__main__":
    main()
