"""Technicolor preprocessing pipeline on a tiny synthetic capture: calibration
parse -> frame copy -> COLMAP db/manual model -> (fake) triangulation ->
the exact layout read_technicolor_scene consumes."""
import os
import shutil
import sqlite3

import numpy as np
from PIL import Image

from ex4dgs_tpu.data.readers import read_technicolor_scene
from ex4dgs_tpu.models.config import ModelConfig
from ex4dgs_tpu.preprocess import technicolor as T

N_CAMS = 3
W, H = 64, 32


def _make_capture(root, scene="Mini", n_frames=4):
    sd = os.path.join(root, scene)
    os.makedirs(sd, exist_ok=True)
    rng = np.random.default_rng(0)
    # calibration: fx cx cy k1 k2 qw qx qy qz tx ty tz
    rows = ["header fx cx cy k1 k2 qw qx qy qz tx ty tz"]
    for c in range(N_CAMS):
        t = [0.3 * c, 0.0, 4.0]
        rows.append(" ".join(str(v) for v in
                             [80.0, W / 2, H / 2, 0.0, 0.0,
                              1.0, 0.0, 0.0, 0.0, *t]))
    with open(os.path.join(sd, "cameras_parameters.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")
    for ts in range(1, n_frames + 1):
        for c in range(N_CAMS):
            img = rng.integers(0, 255, size=(H, W, 3)).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(sd, f"{scene}_undist_{ts:05d}_{c:02d}.png"))
    return sd


def _fake_triangulator(project: str) -> None:
    """Stand-in for the COLMAP CLI: promote the known-pose manual model to
    sparse/0 and synthesize a small triangulated point set."""
    sparse0 = os.path.join(project, "sparse", "0")
    os.makedirs(sparse0, exist_ok=True)
    for name in ("cameras.txt", "images.txt"):
        shutil.copy(os.path.join(project, "manual", name),
                    os.path.join(sparse0, name))
    rng = np.random.default_rng(1)
    with open(os.path.join(sparse0, "points3D.txt"), "w") as f:
        for i in range(50):
            x, y, z = rng.normal(size=3)
            r, g, b = rng.integers(0, 255, size=3)
            f.write(f"{i + 1} {x} {y} {z} {r} {g} {b} 0.5\n")


def test_technicolor_pipeline_end_to_end(tmp_path):
    sd = _make_capture(str(tmp_path))
    projects = T.prepare_technicolor_scene(
        sd, offsets=[1], triangulator=_fake_triangulator)
    assert projects == [os.path.join(sd, "colmap_1")]

    # input layout: one frame per camera, renamed camNN.png
    inp = os.path.join(sd, "colmap_1", "input")
    assert sorted(os.listdir(inp)) == [f"cam{c:02d}.png" for c in range(N_CAMS)]

    # database rows match the calibration (PINHOLE, prior poses)
    con = sqlite3.connect(os.path.join(sd, "colmap_1", "input.db"))
    cams = con.execute("SELECT camera_id, model, width, height FROM cameras").fetchall()
    assert len(cams) == N_CAMS and all(m == 1 for _, m, _, _ in cams)
    assert all(w == T.TECHNI_WIDTH and h == T.TECHNI_HEIGHT for *_, w, h in cams)
    imgs = con.execute("SELECT name, prior_tx FROM images ORDER BY image_id").fetchall()
    assert [n for n, _ in imgs] == [f"cam{c:02d}.png" for c in range(N_CAMS)]
    np.testing.assert_allclose([t for _, t in imgs], [0.0, 0.3, 0.6])
    con.close()

    # the reader consumes the produced layout directly
    cfg = ModelConfig(loader="technicolor", eval=False, start_timestamp=1,
                      end_timestamp=4, resolution=1)
    info = read_technicolor_scene(sd, cfg)
    # 3 cams x timestamps {1, 2, 3}
    assert len(info.train_cameras) == N_CAMS * 3
    assert info.point_cloud.points.shape[0] == 50
    # radius-normalized: cameras re-treated as unit-scale scene
    assert info.nerf_normalization["radius"] == 1
    ts = sorted({c.timestamp for c in info.train_cameras})
    assert ts == [0.0, 1.0, 2.0]


def test_fix_broken_image(tmp_path):
    good = np.full((16, 16, 3), 200, np.uint8)
    ref_p = str(tmp_path / "ref.png")
    Image.fromarray(good).save(ref_p)
    # a truncated png: cut the file in half
    broken_p = str(tmp_path / "broken.png")
    big = np.random.default_rng(0).integers(0, 255, (64, 64, 3)).astype(np.uint8)
    Image.fromarray(big).save(broken_p)
    raw = open(broken_p, "rb").read()
    open(broken_p, "wb").write(raw[: len(raw) // 2])
    ref_big = str(tmp_path / "refbig.png")
    Image.fromarray(np.full((64, 64, 3), 99, np.uint8)).save(ref_big)

    assert T.fix_broken_image(broken_p, ref_big) is True
    out = np.asarray(Image.open(broken_p))
    assert out.shape == (64, 64, 3)
    # zero (lost) regions were filled from the reference frame
    assert (out != 0).any()
    # intact image untouched
    assert T.fix_broken_image(ref_p, ref_big) is False
    np.testing.assert_array_equal(np.asarray(Image.open(ref_p)), good)
