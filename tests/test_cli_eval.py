"""CLI entrypoints (train.py / render_cli.py) and the eval harness end-to-end
on a tiny on-disk scene, plus the Technicolor reader layout."""
import json
import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_data_io import _write_colmap_model, _write_frames


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli_scene"))
    _write_colmap_model(os.path.join(root, "colmap_0", "sparse", "0"), n_cams=3,
                        n_pts=200)
    _write_frames(root, n_cams=3, n_frames=4)
    return root


def test_train_cli_and_render_cli(scene_root, tmp_path):
    import train as train_cli
    import render_cli

    model_path = str(tmp_path / "out")
    train_cli.main([
        "--source_path", scene_root, "--model_path", model_path,
        "--loader", "neural3dvideo", "--resolution", "8",
        "--time_interval", "2", "--time_pad", "1", "--start_duration", "2",
        "--near", "0.05", "--far", "50.0",
        "--iterations", "30", "--densification_interval", "100000",
        "--prune_invisible_interval", "100000",
        "--random_background", "false",
    ])
    assert os.path.exists(os.path.join(model_path, "cfg_args.json"))
    assert os.path.exists(os.path.join(model_path, "cameras.json"))
    assert os.path.exists(os.path.join(model_path, "chkpnt30.npz"))
    assert os.path.exists(
        os.path.join(model_path, "point_cloud", "iteration_30", "point_cloud.ply")
    )

    results = render_cli.main(["--model_path", model_path, "--skip_train",
                               "--fps_inner", "10"])
    test_res = results["test"]
    assert test_res["n_frames"] > 0
    assert "psnr" in test_res and np.isfinite(test_res["psnr"])
    assert "fps" in test_res and test_res["fps"] > 0
    mean_json = os.path.join(model_path, "test", "ours_30", "mean_metrics.json")
    assert os.path.exists(mean_json)
    with open(mean_json) as f:
        saved = json.load(f)
    assert saved["psnr"] == pytest.approx(test_res["psnr"])
    # reference key names present (render.py:98-121) with matching values
    assert saved["PSNR"] == pytest.approx(test_res["psnr"])
    assert saved["SKSSIM2"] == pytest.approx(saved["ssim_sk2"])
    assert "times" in saved
    all_json = os.path.join(model_path, "test", "ours_30", "all_metrics.json")
    with open(all_json) as f:
        per_view = json.load(f)
    assert set(per_view) >= {"SSIM", "SKSSIM", "SKSSIM2", "PSNR"}
    assert len(per_view["PSNR"]) == test_res["n_frames"]


def test_technicolor_reader(tmp_path):
    """Technicolor layout: flat PNGs <scene>_<t>_<cam>.png + colmap_<start>;
    test camera `_10`, radius-normalized translations and points."""
    from PIL import Image

    from ex4dgs_tpu.data.readers import read_technicolor_scene
    from ex4dgs_tpu.models.config import ModelConfig

    root = str(tmp_path / "Birthday")
    sparse = os.path.join(root, "colmap_151", "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    rng = np.random.default_rng(0)

    n_cams = 3
    # cameras.bin with principal-point offsets; images named camXX.png
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_cams))
        for cid in range(1, n_cams + 1):
            f.write(struct.pack("<iiQQ", cid, 1, 640, 480))
            f.write(struct.pack("<dddd", 500.0, 500.0, 330.0, 236.0))
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_cams))
        for i in range(1, n_cams + 1):
            f.write(struct.pack("<i", i))
            f.write(struct.pack("<dddd", 1.0, 0, 0, 0))
            f.write(struct.pack("<ddd", 0.5 * i, 0.0, 4.0))
            f.write(struct.pack("<i", i))
            # name format camXX_NNNN.png -> cam id parsed from name[3:5]
            f.write(f"cam{9 + i:02d}_0000.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 40))
        for p in range(40):
            f.write(struct.pack("<Q", p))
            f.write(struct.pack("<ddd", *rng.normal(size=3)))
            f.write(struct.pack("<BBB", 120, 130, 140))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))

    # flat frames: Birthday_<timestamp>_<cam>.png
    for cam_id in (10, 11, 12):
        for t in (151, 152, 153):
            arr = np.full((48, 64, 3), 10 * cam_id, np.uint8)
            Image.fromarray(arr).save(os.path.join(root, f"Birthday_{t:05d}_{cam_id}.png"))

    cfg = ModelConfig(source_path=root, loader="technicolor", resolution=8,
                      start_timestamp=151, end_timestamp=154, duration=3,
                      eval=True)
    info = read_technicolor_scene(root, cfg)
    # `_10` is the held-out camera
    assert all("_10.png" in c.image_name for c in info.test_cameras)
    assert all("_10.png" not in c.image_name for c in info.train_cameras)
    assert len(info.test_cameras) == 3
    assert len(info.train_cameras) == 6
    # timestamps rebased to start_timestamp
    assert {c.timestamp for c in info.train_cameras} == {0.0, 1.0, 2.0}
    # off-center principal point propagated
    assert abs(info.train_cameras[0].cxr - (330.0 / 640 - 0.5)) < 1e-9
    # radius normalized to 1
    assert info.nerf_normalization["radius"] == 1
    assert info.point_cloud.points.shape == (40, 3)
