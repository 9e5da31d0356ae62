"""MXU-friendly scatter alternatives.

XLA's native scatter on TPU serializes (a 160k-point scatter-max into a 400x400
grid measures ~3.8 ms on v5e — see docs/PERF.md); sorting is no better.  But an
OR/count scatter into a 2D grid is exactly a chunked one-hot matmul:

    img[h, w] = sum_p  onehot_H(y_p)[h] * onehot_W(x_p)[w]      (counts)
    or_mask   = img >= 1

Each chunk of P points costs one [P, H]^T @ [P, W] matmul — dense MXU work at
bf16 throughput instead of serialized scatter.  One-hot values are exactly
representable in bf16 and accumulation happens in f32 (preferred_element_type),
so counts are exact up to 2^24.
"""
from __future__ import annotations

import jax.numpy as jnp


def scatter_count_2d(y_idx: jnp.ndarray, x_idx: jnp.ndarray, mask: jnp.ndarray,
                     height: int, width: int, chunk: int = 8192) -> jnp.ndarray:
    """Count points per (y, x) cell; returns i32[height, width].

    y_idx/x_idx/mask: any shape (flattened internally).  Masked-out points
    contribute nothing (their one-hot rows are all-zero via index -1).
    """
    y = jnp.where(mask, y_idx, -1).reshape(-1)
    x = jnp.where(mask, x_idx, -1).reshape(-1)
    n = y.shape[0]
    pad = (-n) % chunk
    if pad:
        y = jnp.concatenate([y, jnp.full(pad, -1, y.dtype)])
        x = jnp.concatenate([x, jnp.full(pad, -1, x.dtype)])
    y = y.reshape(-1, chunk)
    x = x.reshape(-1, chunk)

    # one_hot of -1 (or any out-of-range index) is the zero row
    hh = jnp.arange(height, dtype=y.dtype)
    ww = jnp.arange(width, dtype=x.dtype)
    acc = jnp.zeros((height, width), jnp.float32)
    for c in range(y.shape[0]):
        oh_y = (y[c][:, None] == hh[None, :]).astype(jnp.bfloat16)   # [P, H]
        oh_x = (x[c][:, None] == ww[None, :]).astype(jnp.bfloat16)   # [P, W]
        acc = acc + jnp.dot(oh_y.T, oh_x, preferred_element_type=jnp.float32)
    return acc.astype(jnp.int32)


def scatter_or_2d(y_idx, x_idx, mask, height: int, width: int,
                  chunk: int = 8192) -> jnp.ndarray:
    """Boolean OR-scatter into a 2D grid; returns bool[height, width]."""
    return scatter_count_2d(y_idx, x_idx, mask, height, width, chunk) > 0
