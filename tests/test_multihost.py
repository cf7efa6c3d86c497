"""Multi-host execution path (SURVEY section 5 'Distributed communication
backend'): 2 OS processes x 2 virtual CPU devices, jax.distributed
coordination, DCN-aware (dcn, dp) mesh, cross-process psum/pmin fleet
reductions via the sharded scenario tick."""

import json
import os
import socket
import subprocess
import sys

WORKER = r"""
import os, json
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
from graphbasedlocaltrajectoryplanner_tpu.parallel.distributed import (
    init_distributed, run_multihost_selftest, make_dist_mesh)
init_distributed()
assert jax.process_count() == 2
mesh = make_dist_mesh()
assert tuple(mesh.axis_names) == ("dcn", "dp"), mesh.axis_names
assert mesh.devices.shape == (2, 2), mesh.devices.shape
rep = run_multihost_selftest(batch_per_device=4, iters=1)
print(json.dumps(rep))
"""


def test_two_process_fleet_collectives():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for r in range(2):
        env = dict(os.environ,
                   GLTPL_NUM_PROCESSES="2",
                   GLTPL_PROCESS_ID=str(r),
                   GLTPL_COORDINATOR=f"localhost:{port}")
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env, cwd=root,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=600) for p in procs]
    reports = []
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{se[-3000:]}"
        reports.append(json.loads(so.strip().splitlines()[-1]))

    assert [r["process_index"] for r in reports] == [0, 1]
    assert all(r["process_count"] == 2 for r in reports)
    assert all(r["global_devices"] == 4 for r in reports)
    # the fleet statistics come out of cross-process collectives — both
    # ranks must hold the identical reduced values
    assert reports[0]["fleet_actions"] == reports[1]["fleet_actions"] > 0
    assert abs(reports[0]["fleet_min_cost"]
               - reports[1]["fleet_min_cost"]) < 1e-4
