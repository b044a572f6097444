"""Sparse x dense matmul.

Mirrors /root/reference/downstream/semseg/lib/math_functions.py:10-75
(``SparseMM`` torch.sparse autograd Function, used by the CRF wrappers'
coordinate mappings).  JAX equivalent: a BCOO matrix is differentiable
through ``@`` natively, so this is a thin constructor + matmul helper.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.experimental import sparse as jsparse


def coo_matrix(rows: np.ndarray, cols: np.ndarray, values: np.ndarray,
               shape: tuple[int, int]) -> jsparse.BCOO:
    idx = jnp.stack([jnp.asarray(rows), jnp.asarray(cols)], axis=1)
    return jsparse.BCOO((jnp.asarray(values), idx), shape=shape)


def sparse_mm(matrix: jsparse.BCOO, dense: jnp.ndarray) -> jnp.ndarray:
    """[R, C] sparse @ [C, F] dense -> [R, F]; differentiable in both."""
    return matrix @ dense


def mapping_matrix(target_rows: np.ndarray, n_rows: int) -> jsparse.BCOO:
    """One-hot row-selection matrix like the CRF in/out mappings
    (math: out[i] = dense[target_rows[i]])."""
    n = len(target_rows)
    return coo_matrix(
        np.arange(n), np.asarray(target_rows), np.ones(n, np.float32),
        (n, n_rows),
    )
