"""Native C++ image loader: build, decode correctness vs PIL, throughput."""
import os
import time

import numpy as np
import pytest

from ex4dgs_tpu.data.scene import load_image


@pytest.fixture(scope="module")
def png_files(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        arr = rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
        p = str(d / f"f{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def test_native_loader_matches_pil(png_files):
    try:
        from ex4dgs_tpu.native import NativeImageLoader
        loader = NativeImageLoader(2)
    except RuntimeError as e:
        pytest.skip(f"native build unavailable: {e}")

    # full-res: exact match (no resampling involved)
    t = loader.submit(png_files[0], 128, 96, 1.0)
    native = loader.wait(t)
    pil = load_image(png_files[0], (128, 96), 1.0)
    np.testing.assert_allclose(native, pil, atol=1 / 255 + 1e-6)

    # downsample: box vs LANCZOS agree closely on smooth content (they only
    # diverge materially on per-pixel noise)
    from PIL import Image

    smooth_path = png_files[1].replace("f1", "smooth")
    yy, xx = np.mgrid[0:96, 0:128]
    smooth = np.stack([xx * 2, yy * 2, (xx + yy)], -1).astype(np.uint8)
    Image.fromarray(smooth).save(smooth_path)
    t = loader.submit(smooth_path, 64, 48, 1.0)
    native = loader.wait(t)
    pil = load_image(smooth_path, (64, 48), 1.0)
    assert native.shape == pil.shape == (48, 64, 3)
    assert np.abs(native - pil).mean() < 0.01

    # exposure scale
    t = loader.submit(png_files[2], 64, 48, 2.0)
    scaled = loader.wait(t)
    t = loader.submit(png_files[2], 64, 48, 1.0)
    base = loader.wait(t)
    np.testing.assert_allclose(scaled, np.clip(base / 2.0, 0, 1), atol=2e-3)

    # many in-flight tickets, out-of-order waits
    tickets = [loader.submit(p, 64, 48, 1.0) for p in png_files]
    for t in reversed(tickets):
        img = loader.wait(t)
        assert img.shape == (48, 64, 3)
        assert np.isfinite(img).all()
    loader.close()


def test_prefetcher_uses_native(png_files):
    from ex4dgs_tpu.data.cameras import Camera
    from ex4dgs_tpu.data.scene import ImagePrefetcher

    cams = [
        Camera(colmap_id=i, uid=i, R=np.eye(3), T=np.zeros(3), fovx=1.0,
               fovy=1.0, image_name=os.path.basename(p), image_path=p,
               width=64, height=48, near=0.1, far=10.0, timestamp=float(i))
        for i, p in enumerate(png_files)
    ]
    pf = ImagePrefetcher(workers=2, lookahead=3)
    seen = []
    for cam, img in pf.epoch(cams, shuffle=False):
        assert img.shape == (48, 64, 3)
        seen.append(cam.colmap_id)
    assert seen == list(range(6))
