"""Multi-chip scaling harness — the BASELINE ≥80%-efficiency metric.

Measures steps/s of the sharded scan-to-map GN step
(parallel/distributed.make_sharded_map_icp_step) in WEAK scaling: every
device carries a fixed 64k-point map shard, so perfect scaling keeps
time/step constant as devices double.  Efficiency(n) = t(1)/t(n).

On real multi-chip hardware this exercises ICI collectives (one
all_gather of per-shard winners per step).  Under a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N) all "devices" share
the same host cores, so the numbers measure correctness + collective
overhead shape, NOT true scaling — the JSON notes which mode ran.

Usage:  python scripts/bench_scaling.py [--devices 1 2 4 8]
Writes SCALING.json at the repo root.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHARD_POINTS = 65536
SCAN_POINTS = 2048


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", nargs="*", type=int, default=None)
    ap.add_argument("--shard-points", type=int, default=SHARD_POINTS)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.json"))
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh (the environment's "
                         "sitecustomize pins the axon TPU otherwise)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mapping_private_tpu.parallel.mesh import make_mesh
    from mapping_private_tpu.parallel.distributed import (
        make_sharded_map_icp_step,
    )

    n_avail = len(jax.devices())
    dev_counts = args.devices or [n for n in (1, 2, 4, 8) if n <= n_avail]
    virtual = jax.default_backend() == "cpu"

    rng = np.random.default_rng(0)
    rows = []
    t1 = None
    for nd in dev_counts:
        M = nd * args.shard_points
        xy = rng.uniform(0, np.sqrt(M / 8000.0), (M, 2))
        z = 0.3 * np.sin(2 * xy[:, 0]) + rng.normal(0, 0.005, M)
        map_xyz = np.column_stack([xy, z]).astype(np.float32)
        nrm = np.tile(np.asarray([0, 0, 1.0], np.float32), (M, 1))
        scan = map_xyz[rng.choice(M, SCAN_POINTS, replace=False)] + 0.01
        mesh = make_mesh((nd,), axis_names=("mp",))
        step, shardings = make_sharded_map_icp_step(mesh, scan_chunk=512)
        a = [
            jnp.asarray(scan), jnp.ones((SCAN_POINTS,), bool),
            jnp.asarray(map_xyz), jnp.ones((M,), bool), jnp.asarray(nrm),
            jnp.eye(4),
        ]
        a = [jax.device_put(x, s) for x, s in zip(a, shardings)]
        T, cnt = step(*a)
        jax.block_until_ready(T)
        t0 = time.time()
        for _ in range(args.reps):
            T, cnt = step(*a)
        jax.block_until_ready(T)
        dt = (time.time() - t0) / args.reps
        if t1 is None:
            t1 = dt
        eff = t1 / dt
        rows.append(dict(devices=nd, map_points=M, step_ms=round(dt * 1e3, 2),
                         steps_per_s=round(1.0 / dt, 2),
                         weak_efficiency=round(eff, 3)))
        print(rows[-1], flush=True)

    out = dict(
        metric="weak-scaling efficiency, sharded scan-to-map GN step",
        shard_points=args.shard_points, scan_points=SCAN_POINTS,
        backend=jax.default_backend(),
        virtual_mesh=virtual,
        note=("virtual CPU mesh: devices share host cores; numbers validate "
              "the sharded program, not real ICI scaling" if virtual else
              "real device mesh"),
        rows=rows,
    )
    with open(args.out, "w") as fp:
        json.dump(out, fp, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
