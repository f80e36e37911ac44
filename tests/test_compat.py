"""OO compatibility facade exercises the reference method surface."""
import numpy as np
import pytest

from ex4dgs_tpu.compat import CGaussianModel, getmodel
from ex4dgs_tpu.models import OptimizationConfig


def test_compat_surface(tmp_path):
    rng = np.random.default_rng(0)
    Model = getmodel("cubic")
    gm = Model(sh_degree=3, duration=10, interval=5, time_pad=3,
               interp_type="cube", rot_interp_type="slerp")
    gm.create_from_pcd(rng.normal(size=(80, 3)).astype(np.float32),
                       rng.uniform(size=(80, 3)).astype(np.float32), 2.0)
    gm.training_setup(OptimizationConfig())

    xyz = gm.get_xyz_at_t(2.0)
    assert xyz.shape[1] == 3
    assert gm.get_opacity_at_t(2.0).shape[0] == xyz.shape[0]
    assert gm.get_features().shape[1] == 16
    assert gm.get_covariance_at_t(2.0).shape[-1] == 6
    gm.oneupSHdegree()
    assert gm.active_sh_degree == 1

    # density events run through the facade
    gm.prune_nan_points()
    gm.reset_opacity()
    hm = gm.capture()
    assert hm.n_static == 80

    # extraction path: give some splats displacement + seen timestamps
    hm.params["xyz_disp"][:5] = 2.0
    hm.stats["xyz_error_min_timestamp"][:] = 1.0
    gm.restore(hm)
    gm.extract_dynamic_points_from_static(
        np.zeros(3), 1.0, np.ones(80, bool), extent=3.0, percentile=0.9,
        max_dur=10.0,
    )
    assert int(gm.model.n_dynamic()) > 0
    gm.expand_duration(20)
    gm.adjust_temp_opa()

    p = str(tmp_path / "point_cloud.ply")
    gm.save_ply(p)
    gm2 = Model(sh_degree=3, duration=21, interval=5, time_pad=3,
                interp_type="cube")
    gm2.load_ply(p)
    assert int(gm2.model.n_static()) == int(gm.model.n_static())
    assert int(gm2.model.n_dynamic()) == int(gm.model.n_dynamic())

    with pytest.raises(NotImplementedError):
        getmodel("unknown")
