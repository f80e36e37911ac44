"""N3V offline preprocessing (preprocess/pipeline.py) on a tiny synthetic
capture: LLFF pose conversion -> COLMAP database + manual model seeding —
the non-external-tool part of pre_n3d.py:66-160 (triangulation itself needs
the COLMAP binary and is feature-gated)."""
import os
import sqlite3

import numpy as np
from PIL import Image

from ex4dgs_tpu.data.colmap import qvec2rotmat, read_images_text
from ex4dgs_tpu.preprocess.llff import llff_poses_to_w2c
from ex4dgs_tpu.preprocess.pipeline import build_n3v_database

N_CAMS, W, H = 4, 64, 48


def _make_capture(root):
    rng = np.random.default_rng(0)
    poses = np.zeros((N_CAMS, 3, 5), np.float64)
    for i in range(N_CAMS):
        ang = 0.3 * i
        c, s = np.cos(ang), np.sin(ang)
        # CV camera-to-world axes: columns (right, down, forward)
        right = np.array([c, 0.0, -s])
        down = np.array([0.0, 1.0, 0.0])
        forward = np.array([s, 0.0, c])
        # LLFF rotation columns are [down, right, backwards]
        poses[i, :3, 0] = down
        poses[i, :3, 1] = right
        poses[i, :3, 2] = -forward
        poses[i, :3, 3] = rng.normal(scale=0.5, size=3)
        poses[i, :3, 4] = [H, W, 80.0]
    bounds = np.tile([1.0, 10.0], (N_CAMS, 1))
    np.save(
        os.path.join(root, "poses_bounds.npy"),
        np.concatenate([poses.reshape(N_CAMS, -1), bounds], axis=1),
    )
    for i in range(N_CAMS):
        cam = os.path.join(root, f"cam{i:02d}")
        os.makedirs(cam)
        img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(cam, "0.png"))
    return poses


def test_build_n3v_database(tmp_path):
    root = str(tmp_path)
    poses = _make_capture(root)
    project = build_n3v_database(root, offset=0)

    # the frame-0 images landed in input/
    for i in range(N_CAMS):
        assert os.path.exists(os.path.join(project, "input", f"cam{i:02d}.png"))

    # the sqlite database holds one PINHOLE camera + prior pose per view
    con = sqlite3.connect(os.path.join(project, "input.db"))
    n_cams = con.execute("select count(*) from cameras").fetchone()[0]
    n_imgs = con.execute("select count(*) from images").fetchone()[0]
    con.close()
    assert n_cams == N_CAMS and n_imgs == N_CAMS

    # the manual model parses with our own COLMAP text reader and the poses
    # roundtrip the LLFF conversion
    images = read_images_text(os.path.join(project, "manual", "images.txt"))
    assert len(images) == N_CAMS
    w2c_ref = llff_poses_to_w2c(poses.transpose(1, 2, 0))
    by_name = {im.name: im for im in images.values()}
    for i in range(N_CAMS):
        im = by_name[f"cam{i:02d}.png"]
        R = qvec2rotmat(im.qvec)
        np.testing.assert_allclose(R, w2c_ref[i][:3, :3], atol=1e-6)
        np.testing.assert_allclose(im.tvec, w2c_ref[i][:3, 3], atol=1e-6)
        # the written pose is a rigid CV world-to-camera: R orthonormal,
        # and R @ forward_world == +z (the camera looks down +z)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        ang = 0.3 * i
        fwd_world = np.array([np.sin(ang), 0.0, np.cos(ang)])
        np.testing.assert_allclose(R @ fwd_world, [0, 0, 1], atol=1e-6)
