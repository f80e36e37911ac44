"""Data layer + IO: COLMAP parsing, readers (synthetic on-disk scene),
PLY roundtrips, checkpoints."""
import math
import os
import struct

import numpy as np
import pytest

from ex4dgs_tpu.data import colmap
from ex4dgs_tpu.data.cameras import resolve_resolution
from ex4dgs_tpu.data.readers import read_n3v_scene
from ex4dgs_tpu.data.scene import ImagePrefetcher, Scene, load_image
from ex4dgs_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from ex4dgs_tpu.io.model_ply import load_model_ply, save_model_ply
from ex4dgs_tpu.io.ply import read_basic_ply, read_ply, write_basic_ply, write_ply
from ex4dgs_tpu.models import ModelConfig, create_from_pcd
from ex4dgs_tpu.models.density import pull, push
from ex4dgs_tpu.models.optimizer import init_state


def _write_colmap_model(sparse, n_cams=3, n_pts=50):
    os.makedirs(sparse, exist_ok=True)
    rng = np.random.default_rng(0)
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_cams))
        for cid in range(1, n_cams + 1):
            f.write(struct.pack("<iiQQ", cid, 1, 640, 480))  # PINHOLE
            f.write(struct.pack("<dddd", 500.0, 500.0, 320.0, 240.0))
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_cams))
        for i in range(1, n_cams + 1):
            f.write(struct.pack("<i", i))
            q = np.array([1.0, 0, 0, 0])
            f.write(struct.pack("<dddd", *q))
            f.write(struct.pack("<ddd", 0.1 * i, 0.0, 2.0))
            f.write(struct.pack("<i", i))
            f.write(f"cam{i - 1:02d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_pts))
        for p in range(n_pts):
            f.write(struct.pack("<Q", p))
            f.write(struct.pack("<ddd", *rng.normal(size=3)))
            f.write(struct.pack("<BBB", 100, 150, 200))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))


def _write_frames(root, n_cams=3, n_frames=4):
    from PIL import Image

    for c in range(n_cams):
        d = os.path.join(root, f"cam{c:02d}")
        os.makedirs(d, exist_ok=True)
        for t in range(n_frames):
            arr = np.full((48, 64, 3), 40 * c + 10 * t, np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{t:04d}.png"))


def test_colmap_binary_roundtrip(tmp_path):
    sparse = str(tmp_path / "sparse" / "0")
    _write_colmap_model(sparse)
    cams, imgs = colmap.read_model(sparse)
    assert len(cams) == 3 and len(imgs) == 3
    assert cams[1].model == "PINHOLE"
    assert imgs[1].name == "cam00.png"
    xyz, rgb, err = colmap.read_points3d_binary(os.path.join(sparse, "points3D.bin"))
    assert xyz.shape == (50, 3) and rgb[0, 0] == 100


def test_n3v_reader_and_scene(tmp_path):
    root = str(tmp_path / "scene")
    _write_colmap_model(os.path.join(root, "colmap_0", "sparse", "0"))
    _write_frames(root)
    cfg = ModelConfig(source_path=root, loader="neural3dvideo", resolution=2,
                      duration=-1, time_interval=2, time_pad=1)
    info = read_n3v_scene(root, cfg)
    # cam00 is the test split (dataset_readers.py:541-542)
    assert all("cam00" in c.image_path for c in info.test_cameras)
    assert all("cam00" not in c.image_path for c in info.train_cameras)
    assert len(info.test_cameras) == 4 and len(info.train_cameras) == 8
    assert info.point_cloud.points.shape == (50, 3)

    scene = Scene(cfg, scene_info=info)
    assert scene.duration == 4  # auto-detected
    assert scene.train_cameras[0].width == 320  # resolution 2 halves 640
    # progressive window
    scene.set_sampling_len(1.0)
    assert all(c.timestamp <= 1.0 for c in scene.sampled_train_cameras())

    # prefetcher decodes shuffled epoch
    pf = ImagePrefetcher(workers=2, lookahead=2)
    seen = 0
    for cam, img in pf.epoch(scene.sampled_train_cameras(), shuffle=True):
        assert img.shape == (cam.height, cam.width, 3)
        assert img.dtype == np.float32
        seen += 1
    assert seen == len(scene.sampled_train_cameras())

    # timepad reflect: extends the camera list
    n0 = len(scene.train_cameras)
    scene.apply_timepad(1, 1)
    assert len(scene.train_cameras) > n0


def test_resolve_resolution():
    assert resolve_resolution(2704, 2028, 2) == (1352, 1014)
    assert resolve_resolution(2704, 2028, -1) == (1600, 1200)
    assert resolve_resolution(1024, 768, -1) == (1024, 768)


def test_basic_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(20, 3)).astype(np.float32)
    rgb = rng.uniform(size=(20, 3)).astype(np.float32)
    p = str(tmp_path / "pc.ply")
    write_basic_ply(p, xyz, rgb)
    pts, cols = read_basic_ply(p)
    np.testing.assert_allclose(pts, xyz, atol=1e-6)
    np.testing.assert_allclose(cols, rgb, atol=1 / 255)


def test_model_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    cfg = ModelConfig(time_interval=5, duration=10)
    model = create_from_pcd(
        rng.normal(size=(30, 3)).astype(np.float32),
        rng.uniform(size=(30, 3)).astype(np.float32),
        cfg, duration=10.0, static_capacity=32,
    )
    hm = pull(model, init_state(model.params))
    # add a couple of dynamics
    hm.params["xyz_disp"][:4] = 1.5
    hm.stats["xyz_error_min_timestamp"][:] = 1.0
    from ex4dgs_tpu.models import density as D

    D.extract_dynamic_from_static(hm, cfg, np.zeros(3, np.float32), 1.0,
                                  np.ones(hm.n_static, bool), extent=3.0,
                                  percentile=0.8, max_dur=10.0)
    path = str(tmp_path / "point_cloud.ply")
    save_model_ply(hm, path)
    assert os.path.exists(str(tmp_path / "dynamic_point_cloud.ply"))

    hm2 = load_model_ply(path, cfg, duration=10.0)
    assert hm2.n_static == hm.n_static
    assert hm2.n_dynamic == hm.n_dynamic
    for k in ("xyz", "opacity", "scaling", "rotation", "xyz_disp",
              "motion_xyz", "motion_opacity_center", "motion_rotation"):
        np.testing.assert_allclose(hm2.params[k], hm.params[k], atol=1e-6,
                                   err_msg=k)


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    cfg = ModelConfig(time_interval=5, duration=10)
    model = create_from_pcd(
        rng.normal(size=(20, 3)).astype(np.float32),
        rng.uniform(size=(20, 3)).astype(np.float32),
        cfg, duration=10.0, static_capacity=32,
    )
    hm = pull(model, init_state(model.params))
    hm.mu["xyz"][:] = 0.5
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, hm, 1234, extra={"sample_len": 7.0})
    hm2, it, extra = load_checkpoint(path)
    assert it == 1234
    assert float(extra["sample_len"]) == 7.0
    np.testing.assert_array_equal(hm2.mu["xyz"], hm.mu["xyz"])
    for k in hm.params:
        np.testing.assert_array_equal(hm2.params[k], hm.params[k])
    # pushes back into a jit-able model
    m2, s2 = push(hm2, cfg)
    assert int(m2.n_static()) == 20


def test_prefetcher_device_cache(tmp_path):
    """Device GT cache: second epoch serves pinned device arrays without
    decoding; the LRU byte budget evicts oldest frames."""
    from PIL import Image

    from ex4dgs_tpu.data.cameras import Camera
    from ex4dgs_tpu.data.scene import ImagePrefetcher

    rng = np.random.default_rng(0)
    cams = []
    for i in range(4):
        arr = rng.integers(0, 255, size=(12, 16, 3)).astype(np.uint8)
        p = str(tmp_path / f"f{i}.png")
        Image.fromarray(arr).save(p)
        cams.append(Camera(
            colmap_id=i, uid=i, R=np.eye(3), T=np.zeros(3), fovx=1.0,
            fovy=1.0, image_name=f"f{i}.png", image_path=p, width=16,
            height=12, near=0.1, far=10.0, timestamp=float(i)))

    pf = ImagePrefetcher(workers=1, lookahead=2, native=False,
                         device_cache_mb=1.0)
    first = {c.colmap_id: np.asarray(img) for c, img in pf.epoch(cams, shuffle=False)}
    assert len(pf._cache) == 4
    # second epoch: pure cache hits, identical content
    for cam, img in pf.epoch(cams, shuffle=False):
        assert ("cached", pf._cache_key(cam)) == pf._submit(cam)
        np.testing.assert_array_equal(np.asarray(img), first[cam.colmap_id])

    # tiny budget: evicts down to the LRU floor (keeps at least one entry)
    tiny = ImagePrefetcher(workers=1, lookahead=2, native=False,
                           device_cache_mb=(12 * 16 * 3 * 4 * 2.5) / 2**20)
    for _ in tiny.epoch(cams, shuffle=False):
        pass
    assert len(tiny._cache) == 2
    assert tiny._cache_bytes <= tiny._cache_budget

    # disabled cache yields plain host arrays
    off = ImagePrefetcher(workers=1, lookahead=2, native=False,
                          device_cache_mb=0)
    for _, img in off.epoch(cams, shuffle=False):
        assert isinstance(img, np.ndarray)
    assert len(off._cache) == 0
