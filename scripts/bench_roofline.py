"""Speed-of-light accounting for the KERNELS.md rows (round-4 verdict
item 7): achieved FLOP/s and HBM bytes/s per hot kernel over measured
time, divided by the chip's peaks, so every throughput number carries a
%-of-peak that says whether further kernel work is worth it.

Peaks (axon chip reports as "TPU v5 lite" = v5e; datasheet numbers):
  - MXU bf16: 197 TFLOP/s.  This package runs geometry at
    jax_default_matmul_precision=highest, which decomposes each f32
    matmul into 6 bf16 passes -> effective f32-highest MXU peak
    197/6 = 32.8 TFLOP/s.
  - VPU f32: 8 vector units x 8x128 lanes x 2 flops (fma) x 0.94 GHz
    = 3.85 TFLOP/s (elementwise/broadcast kernels never touch the MXU).
  - HBM: 819 GB/s.

achieved FLOPs: XLA cost analysis of the compiled module where the
kernel is pure XLA; ANALYTIC flop counts for pallas custom calls (cost
analysis reports 0 for them): exact-1NN distance+argmin = 9 flops/pair
(3 sub + 3 mul + 2 add + 1 cmp).  bytes: cost analysis
"bytes accessed{}" where present.

Usage: python scripts/bench_roofline.py  (run from the repo root;
never overwrite PYTHONPATH on the TPU machine — append if needed)
Writes ROOFLINE.json at the repo root; transfer the % column into
KERNELS.md by hand (the rows there carry their own measured times).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_MXU_F32_HIGHEST = 32.8e12
PEAK_VPU_F32 = 3.85e12
PEAK_HBM = 819e9


_RTT = [None]


def _measure_rtt():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda: jnp.zeros(()))
    jax.device_get(f())
    t0 = time.perf_counter()
    for _ in range(5):
        jax.device_get(f())
    _RTT[0] = (time.perf_counter() - t0) / 5
    print(f"dispatch+readback overhead: {_RTT[0]*1e3:.1f} ms", flush=True)


def timed(fn, *args, reps=0, iters=16):
    """Device time per kernel iteration, robust to the tunneled
    backend's unreliable block_until_ready (it can no-op — only
    device_get truly waits) and to per-call argument upload: K kernel
    iterations run INSIDE one program as a lax.scan whose carry
    perturbs every float input by +0.0*prev_output, making each
    iteration data-dependent on the last (no CSE / loop-invariant
    hoisting); ONE device_get syncs, and the separately measured
    dispatch+readback overhead is subtracted."""
    import jax
    import jax.numpy as jnp

    if _RTT[0] is None:
        _measure_rtt()

    @jax.jit
    def run(*a):
        def body(eps, _):
            pert = jax.tree_util.tree_map(
                lambda x: x + eps.astype(x.dtype)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
                a)
            out = fn(*pert)
            leaf = [l for l in jax.tree_util.tree_leaves(out)
                    if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)]
            # Chain on the FULL reduction of every float output,
            # multiplied by a tiny non-zero constant: mul-by-0.0 gets
            # folded and the body dead-code-eliminated, and chaining on
            # a single element lets XLA DCE everything not feeding that
            # one value (measured: colorchlac117 collapsed to its first
            # bin's reduction).  Σ over all outputs keeps every bin,
            # every query row, every hypothesis live.
            red = (sum(jnp.sum(jnp.real(l)) for l in leaf) if leaf
                   else eps)
            nxt = red * jnp.float32(1e-38)
            return nxt.astype(jnp.float32), None
        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return eps

    jax.device_get(run(*args))  # compile + warmup
    t0 = time.perf_counter()
    jax.device_get(run(*args))
    t = time.perf_counter() - t0
    return max(t - _RTT[0], 1e-9) / iters


def cost(fn, *args):
    import jax

    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    c = c[0] if isinstance(c, (list, tuple)) else c
    return (float(c.get("flops", 0.0)),
            float(c.get("bytes accessed", 0.0)))


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() in ("tpu", "axon"), "run on the TPU"
    rows = []

    def row(name, workload, t_s, flops, bytes_, bound, peak):
        ach = flops / t_s
        bw = bytes_ / t_s if bytes_ else 0.0
        # the binding resource is whichever fraction is higher (bytes
        # from XLA cost analysis overcount post-fusion HBM traffic, so
        # the bw fraction is an upper bound on memory pressure)
        f_c = ach / peak
        f_m = bw / PEAK_HBM
        if f_m > f_c:
            bound = "hbm"
            pct = f_m * 100
        else:
            pct = f_c * 100
        r = dict(kernel=name, workload=workload, time_ms=round(t_s * 1e3, 2),
                 gflops=round(flops / 1e9, 2),
                 achieved_tflops=round(ach / 1e12, 3),
                 achieved_gbps=round(bw / 1e9, 1),
                 bound=bound, pct_of_peak=round(pct, 1))
        rows.append(r)
        print(r, flush=True)

    rng = np.random.default_rng(0)

    # ---- pallas exact 1-NN (VPU; analytic flops) ----
    from mapping_private_tpu.ops.pallas_nn import (
        nn_argmin_prepared, prepare_nn_ref_argmin)

    for n in (20_000, 200_000):
        pts = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        q = jnp.asarray(pts + 0.01)
        ref = prepare_nn_ref_argmin(jnp.asarray(pts))
        f = jax.jit(lambda q, ref: nn_argmin_prepared(q, ref))
        t = timed(f, q, ref, iters=64 if n == 20_000 else 8)
        row("pallas_nn.nn_argmin_prepared", f"{n//1000}k x {n//1000}k",
            t, 9.0 * n * n, 0, "vpu", PEAK_VPU_F32)

    # ---- compact occupied-tiles 1-NN (VPU; analytic computed pairs) ----
    from mapping_private_tpu.ops.tiled_nn import (
        build_compact_tiles, compact_nn_1nn)

    N, tile, cap, MT = 200_000, 0.1, 128, 8192
    xy = rng.uniform(0, 5.0, (N, 2))
    z = (0.3 * np.sin(xy[:, 0] * 2) + 0.2 * np.cos(xy[:, 1] * 3)
         + rng.normal(0, 0.005, N))
    tgt = np.column_stack([xy, z]).astype(np.float32)
    src = (tgt + rng.normal(0, 0.01, tgt.shape)).astype(np.float32)
    lo = tgt.min(0) - 0.2
    dims = tuple(int(v) for v in np.ceil((tgt.max(0) + 0.2 - lo) / tile))
    mask = jnp.ones((N,), bool)
    ct = build_compact_tiles(jnp.asarray(tgt), mask, lo, tile, dims, cap, MT)
    qt = build_compact_tiles(jnp.asarray(src), mask, lo, tile, dims, cap, MT)
    f = jax.jit(lambda a, b: compact_nn_1nn(a, b))
    t = timed(f, ct, qt, iters=16)
    computed_pairs = MT * cap * 27 * cap  # slot x 27-stencil x cap block
    # the engine walks (slot, 27, cap) blocks of cap queries: pairs
    # actually computed = occupied-slot queries x 27 x cap; use the
    # padded program size (what the chip executes)
    row("tiled_nn.compact_nn_1nn", "200k x 200k (padded stencil)",
        t, 9.0 * computed_pairs, 0, "vpu", PEAK_VPU_F32)

    # ---- plane RANSAC (XLA; cost analysis) ----
    from mapping_private_tpu.fit.ransac import fit_plane_ransac

    pts = rng.uniform(-1, 1, (100_000, 3)).astype(np.float32)
    pts[:, 2] = 0.02 * rng.normal(size=100_000)
    key = jax.random.PRNGKey(0)
    m = jnp.ones((100_000,), bool)

    def ransac(p, mm, k):
        return fit_plane_ransac(p, mm, k, threshold=0.03,
                                num_hypotheses=512)

    fl, by = cost(ransac, jnp.asarray(pts), m, key)
    t = timed(ransac, jnp.asarray(pts), m, key, iters=64)
    row("fit.ransac.fit_plane_ransac", "512 hyps x 100k",
        t, fl, by, "vpu", PEAK_VPU_F32)

    # ---- C3-HLAC 117 (MXU einsums at HIGHEST; cost analysis) ----
    from mapping_private_tpu.core.cloud import PointCloud
    from mapping_private_tpu.core.voxelgrid import voxelize
    from mapping_private_tpu.features import colorchlac117

    npts = 200_000
    xyz = rng.uniform(0, 1.27, (npts, 3)).astype(np.float32)
    cloud = PointCloud(
        xyz=jnp.asarray(xyz), mask=jnp.ones(npts, bool),
        channels={c: jnp.asarray(rng.uniform(0, 255, npts), jnp.float32)
                  for c in ("r", "g", "b")})
    grid = voxelize(cloud, 0.01, jnp.zeros(3, jnp.float32), (128, 128, 128),
                    channels=("r", "g", "b"))

    def chlac(g):
        return colorchlac117(g)

    fl, by = cost(chlac, grid)
    t = timed(chlac, grid, iters=256)
    # compute peak as the denominator for the flop fraction; row() flips
    # the label to hbm when the bytes fraction dominates (passing the
    # HBM peak here would divide FLOP/s by bytes/s — unit garbage)
    row("features.colorchlac117", "128^3 grid", t, fl, by,
        "vpu", PEAK_VPU_F32)

    # ---- one GN ICP sweep (XLA matmul-heavy; cost analysis) ----
    from mapping_private_tpu.registration.icp import icp_point_to_plane

    n_t = 20_000
    tgt2 = rng.uniform(-2, 2, (n_t, 3)).astype(np.float32)
    nrm2 = np.tile(np.asarray([0, 0, 1.0], np.float32), (n_t, 1))
    src2 = tgt2[:2000] + np.float32(0.01)

    def sweep(s, t_, n_):
        return icp_point_to_plane(
            s, jnp.ones((2000,), bool), t_, jnp.ones((n_t,), bool), n_,
            iters=1, max_corr_dist=0.5).transform

    a = (jnp.asarray(src2), jnp.asarray(tgt2), jnp.asarray(nrm2))
    fl, by = cost(sweep, *a)
    t = timed(sweep, *a, iters=64)
    row("icp_point_to_plane (1 sweep)", "2k x 20k", t, fl, by,
        "vpu", PEAK_VPU_F32)

    out = dict(
        method=__doc__.split("Usage:")[0],
        peaks=dict(mxu_f32_highest=PEAK_MXU_F32_HIGHEST,
                   vpu_f32=PEAK_VPU_F32, hbm=PEAK_HBM),
        rows=rows,
    )
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ROOFLINE.json")
    with open(path, "w") as fp:
        json.dump(out, fp, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
