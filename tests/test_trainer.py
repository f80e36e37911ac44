"""End-to-end Trainer on a synthetic on-disk scene: schedule events
(densify, progressive growth, extraction plumbing) run without breaking the
jitted step, and optimization makes progress."""
import os
import struct

import numpy as np
import pytest

from ex4dgs_tpu.data.scene import Scene
from ex4dgs_tpu.data.readers import read_n3v_scene
from ex4dgs_tpu.models import ModelConfig, OptimizationConfig
from ex4dgs_tpu.train.trainer import Trainer
from tests.test_data_io import _write_colmap_model, _write_frames


@pytest.fixture(scope="module")
def disk_scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    _write_colmap_model(os.path.join(root, "colmap_0", "sparse", "0"), n_cams=4,
                        n_pts=300)
    _write_frames(root, n_cams=4, n_frames=6)
    return root


def test_trainer_runs_schedule(disk_scene, tmp_path):
    cfg = ModelConfig(
        source_path=disk_scene, loader="neural3dvideo", resolution=8,
        duration=-1, time_interval=2, time_pad=1, start_duration=2,
        near=0.05, far=50.0,
    )
    opt = OptimizationConfig(
        iterations=120,
        densification_interval=30,
        densify_from_iter=20,
        extract_from_iter=20,
        densify_until_iter=1000,
        progressive_growing_steps=40,
        make_dynamic_interval=10,
        extracton_interval=60,
        prune_invisible_interval=100000,
        random_background=False,
    )
    scene = Scene(cfg, scene_info=read_n3v_scene(disk_scene, cfg))
    trainer = Trainer(cfg, opt, scene, capacity=65536, max_per_tile=256)
    n0 = int(trainer.model.n_static())
    metrics = trainer.train(iterations=120)

    losses = np.asarray(metrics["loss"])
    assert np.isfinite(losses).all()
    assert losses[-10:].mean() < losses[:10].mean()  # learning
    # densify ran (counts may go either way, but stats were reset)
    assert int(trainer.model.n_static()) > 0
    # progressive window advanced
    assert trainer.sample_len >= cfg.start_duration

    # save produces reference-layout artifacts
    mp = str(tmp_path / "out")
    trainer.save(mp)
    it = trainer.iteration
    assert os.path.exists(
        os.path.join(mp, "point_cloud", f"iteration_{it}", "point_cloud.ply")
    )
    assert os.path.exists(os.path.join(mp, f"chkpnt{it}.npz"))

    # resume from checkpoint
    from ex4dgs_tpu.io.checkpoint import load_checkpoint
    from ex4dgs_tpu.models.density import push

    hm, saved_it, extra = load_checkpoint(os.path.join(mp, f"chkpnt{it}.npz"))
    assert saved_it == it
    model2, opt_state2 = push(hm, cfg)
    t2 = Trainer(cfg, opt, scene, model=model2, opt_state=opt_state2,
                 capacity=65536, max_per_tile=256)
    t2.iteration = saved_it
    t2.sample_len = float(extra["sample_len"])
    m2 = t2.train(iterations=saved_it + 10)
    assert np.isfinite(np.asarray(m2["loss"])).all()


def test_trainer_overflow_retry(disk_scene):
    """Starting from an undersized instance buffer, the trainer must detect
    the overflow, grow capacity, and re-run the same camera so no truncated
    update is ever applied."""
    cfg = ModelConfig(
        source_path=disk_scene, loader="neural3dvideo", resolution=8,
        duration=-1, time_interval=2, time_pad=1, start_duration=2,
        near=0.05, far=50.0,
    )
    opt = OptimizationConfig(
        iterations=3, densification_interval=1000, densify_from_iter=1000,
        extract_from_iter=1000, densify_until_iter=1000,
        progressive_growing_steps=1000, prune_invisible_interval=100000,
        random_background=False,
    )
    scene = Scene(cfg, scene_info=read_n3v_scene(disk_scene, cfg))
    trainer = Trainer(cfg, opt, scene, capacity=256, max_per_tile=256)
    metrics = trainer.train(iterations=3)
    assert trainer.overflow_count >= 1
    assert trainer.capacity > 256  # grew to fit the true instance count
    losses = np.asarray(metrics["loss"])
    assert np.isfinite(losses).all()
    # the applied steps were all full-capacity ones (params moved and finite)
    for k, v in trainer.model.params.items():
        assert bool(np.isfinite(np.asarray(v)).all()), k


def test_trainer_sharded_mesh(disk_scene):
    """Trainer with a (data=2, gauss=2) mesh: the SPMD path trains and stays
    finite; schedule events interleave with sharded steps."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from ex4dgs_tpu.parallel.mesh import make_mesh

    cfg = ModelConfig(
        source_path=disk_scene, loader="neural3dvideo", resolution=8,
        duration=-1, time_interval=2, time_pad=1, start_duration=2,
        near=0.05, far=50.0,
    )
    opt = OptimizationConfig(
        iterations=40, densification_interval=15, densify_from_iter=10,
        extract_from_iter=10, densify_until_iter=1000,
        progressive_growing_steps=20, make_dynamic_interval=5,
        extracton_interval=30, prune_invisible_interval=100000,
        random_background=False,
    )
    scene = Scene(cfg, scene_info=read_n3v_scene(disk_scene, cfg))
    mesh = make_mesh(4, data=2, gauss=2)
    trainer = Trainer(cfg, opt, scene, capacity=66560, max_per_tile=256,
                      mesh=mesh)
    metrics = trainer.train(iterations=40)
    losses = np.asarray(metrics["loss"])
    assert np.isfinite(losses).all()
    assert losses[-5:].mean() < losses[:5].mean() * 1.5
    for k, v in trainer.model.params.items():
        assert bool(np.isfinite(np.asarray(v)).all()), k


def test_trainer_preallocates_keyframes(disk_scene):
    """Progressive duration growth must never reshape the motion arrays:
    keyframe capacity is sized for the full scene duration at construction
    (every capacity reshape retraces the jitted step — minutes per graph on
    the remote TPU compile service)."""
    cfg = ModelConfig(
        source_path=disk_scene, loader="neural3dvideo", resolution=8,
        duration=-1, time_interval=2, time_pad=1, start_duration=2,
        near=0.05, far=50.0,
    )
    opt = OptimizationConfig(
        iterations=90, densification_interval=1000, densify_from_iter=1000,
        extract_from_iter=10, densify_until_iter=1000,
        progressive_growing_steps=30, make_dynamic_interval=5,
        extracton_interval=40, prune_invisible_interval=100000,
        random_background=False,
    )
    scene = Scene(cfg, scene_info=read_n3v_scene(disk_scene, cfg))
    trainer = Trainer(cfg, opt, scene, capacity=65536, max_per_tile=256)
    from ex4dgs_tpu.models.state import required_keyframes

    kc0 = trainer.model.params["motion_xyz"].shape[1]
    assert kc0 >= required_keyframes(scene.duration + cfg.time_shift, cfg)
    kn0 = int(trainer.model.keyframe_num)
    trainer.train(iterations=90)  # crosses progressive-growth boundaries
    assert trainer.model.params["motion_xyz"].shape[1] == kc0  # no reshape
    assert trainer.sample_len > cfg.start_duration  # growth actually ran
    assert int(trainer.model.keyframe_num) >= kn0


def test_trainer_pipeline_matches_serial(disk_scene):
    """The lag-1 pipelined loop (default) must produce the same training
    trajectory as the serial loop (EX4DGS_PIPELINE=0): the device math is
    identical (steps chain on model futures either way); only host
    bookkeeping timing differs. Same seed, no overflow => identical params."""
    cfg = ModelConfig(
        source_path=disk_scene, loader="neural3dvideo", resolution=8,
        duration=-1, time_interval=2, time_pad=1, start_duration=2,
        near=0.05, far=50.0,
    )
    opt = OptimizationConfig(
        iterations=60, densification_interval=25, densify_from_iter=10,
        extract_from_iter=10, densify_until_iter=1000,
        progressive_growing_steps=30, make_dynamic_interval=5,
        extracton_interval=40, prune_invisible_interval=100000,
        random_background=False,
    )

    def run(pipeline_env):
        old = os.environ.get("EX4DGS_PIPELINE")
        os.environ["EX4DGS_PIPELINE"] = pipeline_env
        try:
            scene = Scene(cfg, scene_info=read_n3v_scene(disk_scene, cfg))
            tr = Trainer(cfg, opt, scene, capacity=65536, max_per_tile=256,
                         seed=11)
            metrics = tr.train(iterations=60)
            return tr, metrics
        finally:
            if old is None:
                os.environ.pop("EX4DGS_PIPELINE", None)
            else:
                os.environ["EX4DGS_PIPELINE"] = old

    tr_p, m_p = run("1")
    tr_s, m_s = run("0")
    assert tr_p.overflow_count == 0 and tr_s.overflow_count == 0
    np.testing.assert_allclose(np.asarray(m_p["loss"]),
                               np.asarray(m_s["loss"]), rtol=0, atol=0)
    for k in tr_p.model.params:
        np.testing.assert_array_equal(
            np.asarray(tr_p.model.params[k]), np.asarray(tr_s.model.params[k]),
            err_msg=k)
    assert int(tr_p.model.n_static()) == int(tr_s.model.n_static())
    assert int(tr_p.model.n_dynamic()) == int(tr_s.model.n_dynamic())
