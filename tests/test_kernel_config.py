"""KernelConfig validation + install semantics (VERDICT r2 #5).

The five kernel knobs (tile shape, pane pairing, DMA chunk, window
alignment, pipeline depth) used to be import-time env vars whose mutual
constraints were comments; misconfigurations died inside Mosaic. They are
now validated at configure() time with actionable errors, and configure()
rebinds the module globals the kernels actually read.
"""
import pytest

from ex4dgs_tpu.kernel_config import KernelConfig, configure, current


def test_default_is_valid_and_self_describing():
    cfg = KernelConfig().validate()
    assert cfg.n_pix == 512  # 32x16, the measured optimum (BASELINE.md r3)
    d = cfg.as_dict()
    assert set(d) == {"tile_x", "tile_y", "pair", "g_chunk", "win_align",
                      "bufs", "exact_sort", "pair_fwd", "tight_cull",
                      "aligned_layout", "kernel_dot", "power", "pack_vjp",
                      "ssim_blur", "scan_dot", "untile"}
    assert KernelConfig.from_dict(d) == cfg


def test_old_checkpoint_dicts_still_load():
    # round-3 checkpoints recorded only the original eight knobs; loading
    # them must fill the newer knobs with defaults
    old = {"tile_x": 32, "tile_y": 16, "pair": 1, "g_chunk": 128,
           "win_align": 128, "bufs": 2, "exact_sort": False, "pair_fwd": 0}
    cfg = KernelConfig.from_dict(old)
    # newer knobs fill with CURRENT defaults (split3 since round 5)
    assert cfg.kernel_dot == "split3" and cfg.untile == "naive"
    assert not cfg.tight_cull


@pytest.mark.parametrize("bad", [
    dict(tile_x=12),                    # not sublane-aligned
    dict(tile_x=8, tile_y=8),           # area 64 < 128 lanes
    dict(tile_x=64, tile_y=32),         # area 2048 > 1024
    dict(pair=0),
    dict(g_chunk=192),                  # not a lane multiple
    dict(win_align=64),
    dict(win_align=512),
    dict(bufs=1),
    # The documented VMEM wall: 512-px tiles at pair=2 with 256-instance DMA
    # windows (BASELINE.md negative result) must fail at configure time, not
    # inside Mosaic. (At g_chunk=128 the live set halves and fits the model.)
    dict(tile_x=32, tile_y=16, pair=2, g_chunk=256),
    dict(pair=4),
    # string knobs must be validated values, not free-form env text
    dict(kernel_dot="bf16"),
    dict(power="fast"),
    dict(pack_vjp="atomic"),
    dict(ssim_blur="conv"),
    dict(scan_dot="default"),
    dict(untile="padded"),
])
def test_invalid_configs_fail_fast(bad):
    with pytest.raises(ValueError, match="invalid KernelConfig"):
        KernelConfig(**bad).validate()


def test_512px_tiles_require_pair_1():
    # the documented escape hatch for wide tiles
    KernelConfig(tile_x=32, tile_y=16, pair=1).validate()


def test_configure_rebinds_module_globals():
    from ex4dgs_tpu.ops import (compositing, losses, projection,
                                rasterize_pallas, scan_ops)

    base = current()
    try:
        cfg = KernelConfig(tile_x=32, tile_y=16, pair=1,
                           kernel_dot="highest", power="mxu",
                           pack_vjp="scatter", ssim_blur="matmul",
                           scan_dot="highest", untile="aligned")
        configure(cfg)
        assert projection.TILE_X == 32 and projection.TILE_Y == 16
        assert rasterize_pallas.PAIR == 1
        assert rasterize_pallas.N_PIX == 512
        # round-4 numeric-strategy knobs (VERDICT r4 #6) rebind too
        assert rasterize_pallas.KERNEL_DOT == "highest"
        assert rasterize_pallas.POWER_IMPL == "mxu"
        assert rasterize_pallas.PACK_VJP == "scatter"
        assert losses.SSIM_BLUR == "matmul"
        assert scan_ops.SCAN_DOT == "highest"
        assert compositing.UNTILE == "aligned"
    finally:
        configure(base)
    assert projection.TILE_X == base.tile_x
    assert rasterize_pallas.N_PIX == base.n_pix
    assert rasterize_pallas.KERNEL_DOT == base.kernel_dot
    assert compositing.UNTILE == base.untile


def test_checkpoint_roundtrip_json():
    import json

    cfg = KernelConfig(tile_x=32, tile_y=16, pair=1)
    assert KernelConfig.from_dict(json.loads(cfg.to_json())) == cfg
