"""Training checkpoints: full optimizer-state-preserving save/resume.

The reference pickles a 40-tuple with torch (train.py:195-197,
c_gaussian_model.py:217-320). Here a compact HostModel (params + stats +
RAdam moments + counters) is written as a single .npz — multi-host
deterministic resume is just `pull -> save` on host 0 and `load -> push`
everywhere (the pushed arrays are replicated by the sharded step).
"""
from __future__ import annotations

import os

import numpy as np

from ..models.density import HostModel


def save_checkpoint(path: str, hm: HostModel, iteration: int,
                    extra: dict | None = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "iteration": np.asarray(iteration),
        "step": np.asarray(hm.step),
        "active_sh_degree": np.asarray(hm.active_sh_degree),
        "duration": np.asarray(hm.duration),
        "keyframe_num": np.asarray(hm.keyframe_num),
    }
    for group, prefix in ((hm.params, "param"), (hm.stats, "stat"),
                          (hm.mu, "mu"), (hm.nu, "nu")):
        for k, v in group.items():
            payload[f"{prefix}:{k}"] = v
    for k, v in (extra or {}).items():
        payload[f"extra:{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    np.savez(tmp, **payload)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_checkpoint(path: str) -> tuple[HostModel, int, dict]:
    z = np.load(path, allow_pickle=False)
    params, stats, mu, nu, extra = {}, {}, {}, {}, {}
    for key in z.files:
        if ":" not in key:
            continue
        prefix, name = key.split(":", 1)
        {"param": params, "stat": stats, "mu": mu, "nu": nu,
         "extra": extra}[prefix][name] = z[key]
    hm = HostModel(
        params=params, stats=stats, mu=mu, nu=nu,
        step=int(z["step"]),
        active_sh_degree=int(z["active_sh_degree"]),
        duration=float(z["duration"]),
        keyframe_num=int(z["keyframe_num"]),
    )
    return hm, int(z["iteration"]), extra
