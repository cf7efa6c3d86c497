"""Multi-host execution — SURVEY section 5 "Distributed communication
backend", realized the JAX way: ``jax.distributed`` + a DCN-aware device
mesh instead of the NCCL/MPI process groups a torch framework would carry.

Topology mapping: the outer ``dcn`` mesh axis has one row per process, so
collectives crossing it ride the inter-host fabric (DCN; gloo on the CPU
backend), while the inner ``dp`` axis spans each host's local devices and
stays on ICI.  ``make_sharded_tick`` (parallel/scenario.py) accepts these
meshes directly — batch sharded over all mesh axes, fleet statistics
reduced over all of them with one ``psum``/``pmin``.

Environment contract (mirrors the usual JAX cluster envs, with GLTPL_*
overrides so the scaling bench / tests can orchestrate local multi-process
runs):

    GLTPL_NUM_PROCESSES   total process count (default 1 -> no-op)
    GLTPL_PROCESS_ID      this process's rank
    GLTPL_COORDINATOR     host:port of rank 0's coordinator service
"""

from __future__ import annotations

import os

import numpy as np


def init_distributed(coordinator_address: str = None,
                     num_processes: int = None,
                     process_id: int = None):
    """Initialize the JAX distributed runtime (idempotent wrapper).

    Arguments default from the ``GLTPL_*`` environment; with one process
    (or none configured) this is a no-op.  Returns
    ``(process_index, process_count)``.
    """
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("GLTPL_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return 0, 1
    if coordinator_address is None:
        coordinator_address = os.environ.get("GLTPL_COORDINATOR",
                                             "localhost:12731")
    if process_id is None:
        process_id = int(os.environ.get("GLTPL_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index(), jax.process_count()


def make_dist_mesh(axis_names=("dcn", "dp")):
    """Device mesh spanning every process: shape
    ``(process_count, local_device_count)`` with one row per process so the
    outer axis is the DCN dimension.  Single-process: a flat ``("dp",)``
    mesh over the local devices (the existing single-host path)."""
    import jax

    n_proc = jax.process_count()
    if n_proc == 1:
        return jax.sharding.Mesh(np.array(jax.devices()), ("dp",))
    rows = []
    for p in range(n_proc):
        rows.append([d for d in jax.devices() if d.process_index == p])
    width = min(len(r) for r in rows)
    grid = np.array([r[:width] for r in rows])
    return jax.sharding.Mesh(grid, axis_names)


def shard_scenarios(scen, mesh):
    """Distribute a scenario batch over the mesh: each process contributes
    its process-local slice (identical construction on every process, sliced
    by rank) and the leaves become global arrays sharded over all mesh
    axes.  Works identically on a single-process mesh."""
    import jax

    spec = jax.sharding.PartitionSpec(tuple(mesh.axis_names))
    n_proc = jax.process_count()

    def place(x):
        sh = jax.sharding.NamedSharding(mesh, spec)
        if n_proc == 1:
            return jax.device_put(x, sh)
        b = x.shape[0]
        per = b // n_proc
        r = jax.process_index()
        local = np.asarray(x)[r * per:(r + 1) * per]
        return jax.make_array_from_process_local_data(sh, local,
                                                      global_shape=x.shape)

    return jax.tree_util.tree_map(place, scen)


def run_multihost_selftest(batch_per_device: int = 8, iters: int = 2,
                           seed: int = 0, return_results: bool = False):
    """One multi-process sharded-tick run (called inside an initialized
    process): builds the quick oval lattice, runs ``make_sharded_tick``
    over the DCN mesh, and returns the fleet statistics — which every
    process must agree on (they come out of cross-process collectives).

    Used by ``scaling_bench.py --multihost N`` workers and the 2-process
    CPU test (tests/test_multihost.py)."""
    import jax
    import time

    from graphbasedlocaltrajectoryplanner_tpu.models.track import (
        make_oval_track)
    from graphbasedlocaltrajectoryplanner_tpu.models.lattice import (
        build_lattice)
    from graphbasedlocaltrajectoryplanner_tpu.utils.config import (
        OfflineConfig)
    from graphbasedlocaltrajectoryplanner_tpu.parallel import scenario as sc

    lat = build_lattice(make_oval_track(n=200, r=50.0, straight=150.0),
                        OfflineConfig(min_plan_horizon=200.0),
                        md5_params="scaling")
    mesh = make_dist_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    batch = batch_per_device * n_dev
    scen = sc.random_scenarios(lat, batch=batch, seed=seed, n_objects=1)
    scen = shard_scenarios(scen, mesh)
    tick = sc.make_sharded_tick(lat, mesh)
    res, stats = tick(scen)
    jax.block_until_ready(stats)
    t0 = time.perf_counter()
    for _ in range(iters):
        res, stats = tick(scen)
    jax.block_until_ready(stats)
    dt = time.perf_counter() - t0
    rep = dict(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        global_devices=n_dev,
        batch=batch,
        replans_per_sec=batch * iters / dt,
        fleet_min_cost=float(stats["fleet_min_cost"]),
        fleet_actions=int(stats["fleet_actions"]),
    )
    if return_results:
        # gather the globally-sharded results to every host so the test
        # harness can compare them against a single-process run of the
        # SAME scenario batch (result-equality gate, VERDICT r2 item 9)
        from jax.experimental import multihost_utils
        cost = multihost_utils.process_allgather(res["cost"], tiled=True)
        valid = multihost_utils.process_allgather(res["valid"], tiled=True)
        trajs = multihost_utils.process_allgather(res["trajs"], tiled=True)
        rep["cost"] = np.asarray(cost).tolist()
        rep["valid"] = np.asarray(valid).astype(int).tolist()
        rep["traj_sum"] = np.sum(np.abs(np.asarray(trajs, np.float64)),
                                 axis=(1, 2, 3)).tolist()
    return rep
