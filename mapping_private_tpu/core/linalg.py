"""Small fixed-size linear algebra, unrolled for XLA.

`jnp.linalg.solve` on a 6×6 lowers to generic LU kernels that cost
far more than the 6×6 system deserves inside a jitted GN loop.  These
trace-time-unrolled routines produce a pure scalar dataflow graph that
XLA fuses into the surrounding computation (used by ICP, pose-graph GN,
and RANSAC refinement — everywhere the reference called Eigen's dense
solvers, e.g. registration.cpp:65-77 JacobiSVD, sac_model_rotational.cpp:357
llt()).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky_solve_unrolled(H: jax.Array, g: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Solve H x = g for symmetric positive-definite H (n ≤ ~8), unrolled.

    H: (n, n), g: (n,).  Returns x (n,).  ``jitter`` is added to the
    diagonal (Levenberg damping).
    """
    n = H.shape[0]
    h = [[H[i, j] for j in range(n)] for i in range(n)]
    if jitter:
        for i in range(n):
            h[i][i] = h[i][i] + jitter
    # Cholesky: L lower-triangular with H = L Lᵀ
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = h[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    # forward substitution L y = g
    y = [None] * n
    for i in range(n):
        s = g[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution Lᵀ x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)
