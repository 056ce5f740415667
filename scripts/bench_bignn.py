"""Big-cloud NN + ICP benchmarks (KERNELS.md rows; run on the real TPU)."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from mapping_private_tpu.ops.tiled_nn import (
    build_tiles, tiled_nn_1nn, build_compact_tiles, compact_nn_1nn)
from mapping_private_tpu.ops.pallas_nn import prepare_nn_ref_argmin, nn_argmin_prepared
from mapping_private_tpu.registration.icp import icp_point_to_plane_tiled

def timeit(fn, reps=10):
    out = fn(); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / reps

rng = np.random.default_rng(0)

def scan_cloud(n, extent=5.0):
    xy = rng.uniform(0, extent, (n, 2))
    z = 0.3*np.sin(xy[:,0]*2) + 0.2*np.cos(xy[:,1]*3) + rng.normal(0, 0.005, n)
    return np.column_stack([xy, z]).astype(np.float32)

def lattice(pts, tile):
    lo = pts.min(0) - 2*tile
    dims = tuple(int(v) for v in np.ceil((pts.max(0)+2*tile - lo)/tile))
    return lo, dims

for N, tile, cap in [(200_000, 0.1, 128), (1_000_000, 0.05, 128)]:
    tgt = scan_cloud(N)
    src = (tgt + rng.normal(0, 0.01, tgt.shape)).astype(np.float32)
    tgt_j, src_j = jnp.asarray(tgt), jnp.asarray(src)
    mask = jnp.ones((N,), bool)
    lo, dims = lattice(tgt, tile)
    cell = np.floor((tgt - lo) / tile).astype(np.int64)
    occ = len(np.unique(
        (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]))
    MT = 1 << int(np.ceil(np.log2(max(int(1.5 * occ), 64))))
    print(f"--- N={N} tile={tile} dims={dims} cap={cap} occ={occ} MT={MT}")
    ct = build_compact_tiles(tgt_j, mask, lo, tile, dims, cap, MT)
    ovf = int(np.asarray(ct.rank_of >= cap).sum())
    f_cbuild = jax.jit(lambda: build_compact_tiles(
        src_j, mask, lo, tile, dims, cap, MT))
    f_cnn = jax.jit(lambda: compact_nn_1nn(ct, f_cbuild()))
    t = timeit(f_cnn, 5)
    idx, sq = f_cnn()
    ans = float(jnp.mean(idx >= 0))
    print(f"compact 1-NN {N/1e3:.0f}k x {N/1e3:.0f}k: {t*1e3:.1f} ms  "
          f"(overflow={ovf}, answered={ans:.4f})")
    if N <= 200_000:
        tt = build_tiles(tgt_j, mask, lo, tile, dims, cap)
        f_build = jax.jit(lambda: build_tiles(src_j, mask, lo, tile, dims, cap))
        f_nn = jax.jit(lambda: tiled_nn_1nn(tt, f_build(), src_j))
        td = timeit(f_nn, 2)
        di, _ = f_nn()
        agree = float(jnp.mean((di == idx) | (di < 0) | (idx < 0)))
        print(f"dense tiled 1-NN: {td*1e3:.1f} ms (compact idx agreement {agree:.4f})")
    if N == 200_000:
        rt = prepare_nn_ref_argmin(tgt_j)
        fp = jax.jit(lambda: nn_argmin_prepared(src_j, rt))
        tp = timeit(fp, 5)
        print(f"pallas brute 1-NN: {tp*1e3:.1f} ms ({N*N/tp/1e9:.0f} G pairs/s)")
        pidx, psq = fp()
        t64, s64 = tgt.astype(np.float64), src.astype(np.float64)
        gi = np.asarray(idx); ok = gi >= 0
        ex = np.max(np.sum((s64[ok]-t64[gi[ok]])**2,1) - np.sum((s64[ok]-t64[np.asarray(pidx)[ok]])**2,1))
        print(f"tiled vs pallas max d2 excess: {ex:.2e}")
    # ICP (not under outer jit: tiled backend needs concrete targets)
    nrm = jnp.tile(jnp.asarray([0.,0.,1.], jnp.float32), (N,1))
    t0 = time.time()
    res = icp_point_to_plane_tiled(src_j, mask, tgt_j, mask, nrm,
                                   tile_size=tile, cap_per_cell=cap, iters=6)
    jax.block_until_ready(res.transform)
    t_icp1 = time.time()-t0   # includes compile
    t0 = time.time()
    res = icp_point_to_plane_tiled(src_j, mask, tgt_j, mask, nrm,
                                   tile_size=tile, cap_per_cell=cap, iters=6)
    jax.block_until_ready(res.transform)
    t_icp = time.time()-t0
    print(f"ICP 6-sweep {N/1e3:.0f}k tiled: {t_icp*1e3:.1f} ms (first call {t_icp1:.1f} s)  rmse={float(res.rmse):.5f}")
