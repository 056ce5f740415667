"""Big-cloud NN + ICP benchmarks (KERNELS.md rows; run on the real TPU)."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from mapping_private_tpu.ops.neighbors import build_grid_hash, knn_grid, knn_bruteforce
from mapping_private_tpu.ops.pallas_nn import prepare_nn_ref_argmin, nn_argmin_prepared
from mapping_private_tpu.core.cloud import PAD_COORD
from mapping_private_tpu.registration.icp import icp_point_to_plane

def timeit(fn, reps=20):
    fn()  # compile
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / reps

rng = np.random.default_rng(0)

def scan_cloud(n, extent=5.0):
    # room-scan-like: points on a 2.5D surface over a 5x5m area
    xy = rng.uniform(0, extent, (n, 2))
    z = 0.3*np.sin(xy[:,0]*2) + 0.2*np.cos(xy[:,1]*3) + rng.normal(0, 0.005, n)
    return np.column_stack([xy, z]).astype(np.float32)

N = 200_000
tgt = scan_cloud(N)
src = (tgt + rng.normal(0, 0.01, tgt.shape)).astype(np.float32)
tgt_j, src_j = jnp.asarray(tgt), jnp.asarray(src)
mask = jnp.ones((N,), bool)

# --- pallas exact 1-NN 200k x 200k
rt = prepare_nn_ref_argmin(tgt_j)
f = jax.jit(lambda: nn_argmin_prepared(src_j, rt))
t = timeit(f, 5)
print(f"pallas exact 1-NN {N/1e3:.0f}k x {N/1e3:.0f}k: {t*1e3:.1f} ms  ({N*N/t/1e9:.0f} G pairs/s)")

# --- grid-hash 1-NN
for cell, cap in [(0.05, 16), (0.1, 32)]:
    grid = build_grid_hash(tgt_j, mask, cell)
    from mapping_private_tpu.ops.neighbors import nn_grid_1nn
    g = jax.jit(lambda grid=grid, cap=cap: nn_grid_1nn(grid, src_j, cap_per_cell=cap))
    t = timeit(g, 10)
    idx, sq = g()
    # recall vs pallas (exact)
    pidx, psq = f()
    agree = float(jnp.mean((idx == pidx) | (jnp.abs(sq-psq) < 1e-10)))
    print(f"grid 1-NN cell={cell} cap={cap}: {t*1e3:.2f} ms  agreement={agree:.4f}")

# --- ICP at 200k
for backend in ["pallas", "grid"]:
    kw = dict(nn_backend=backend, grid_cell=0.1, cap_per_cell=32, iters=6)
    icp = jax.jit(lambda: icp_point_to_plane(
        src_j, mask, tgt_j, mask,
        jnp.tile(jnp.asarray([0.,0.,1.], jnp.float32), (N,1)), **kw))
    t = timeit(icp, 5)
    r = icp()
    print(f"ICP 6-sweep {N/1e3:.0f}k pts backend={backend}: {t*1e3:.1f} ms  rmse={float(r.rmse):.5f}")

# --- 1M-point grid NN
N2 = 1_000_000
tgt2 = jnp.asarray(scan_cloud(N2))
src2 = jnp.asarray(scan_cloud(N2))
mask2 = jnp.ones((N2,), bool)
grid2 = build_grid_hash(tgt2, mask2, 0.05)
from mapping_private_tpu.ops.neighbors import nn_grid_1nn as _nn1
g2 = jax.jit(lambda: _nn1(grid2, src2, cap_per_cell=16))
t = timeit(g2, 5)
print(f"grid 1-NN 1M x 1M cell=0.05: {t*1e3:.1f} ms")
