"""Two-process jax.distributed on CPU: the multi-host path
(runtime/distributed.py) drives one sharded trainer step over a global
(data=2, gauss=2) mesh spanning both processes, with consistent results and
checkpoint resume. Marked slow: spawns two fresh JAX processes."""
import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_step(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PALLAS_AXON_POOL_IPS="",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"localhost:{port}", "2", str(pid),
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]

    results = {}
    for out in outs:
        m = re.search(
            r"RESULT pid=(\d+) loss=([\d.eE+-]+) checksum=([\d.eE+-]+) "
            r"resumed=([\d.eE+-]+) it=(\d+)", out)
        assert m, out[-4000:]
        results[int(m.group(1))] = tuple(float(x) for x in m.groups()[1:])

    assert set(results) == {0, 1}
    # both processes computed the identical replicated update
    assert results[0] == results[1], results
    loss, checksum, resumed, it = results[0]
    assert it == 1
    # the checkpoint round-trips the post-step parameters on every host
    assert abs(resumed - checksum) < 1e-3 * max(1.0, checksum)
