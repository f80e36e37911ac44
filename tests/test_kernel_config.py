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
                      "bufs", "exact_sort", "pair_fwd"}
    assert KernelConfig.from_dict(d) == cfg


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
])
def test_invalid_configs_fail_fast(bad):
    with pytest.raises(ValueError, match="invalid KernelConfig"):
        KernelConfig(**bad).validate()


def test_512px_tiles_require_pair_1():
    # the documented escape hatch for wide tiles
    KernelConfig(tile_x=32, tile_y=16, pair=1).validate()


def test_configure_rebinds_module_globals():
    from ex4dgs_tpu.ops import projection, rasterize_pallas

    base = current()
    try:
        cfg = KernelConfig(tile_x=32, tile_y=16, pair=1)
        configure(cfg)
        assert projection.TILE_X == 32 and projection.TILE_Y == 16
        assert rasterize_pallas.PAIR == 1
        assert rasterize_pallas.N_PIX == 512
    finally:
        configure(base)
    assert projection.TILE_X == base.tile_x
    assert rasterize_pallas.N_PIX == base.n_pix


def test_checkpoint_roundtrip_json():
    import json

    cfg = KernelConfig(tile_x=32, tile_y=16, pair=1)
    assert KernelConfig.from_dict(json.loads(cfg.to_json())) == cfg
