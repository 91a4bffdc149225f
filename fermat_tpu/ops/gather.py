"""Gather strategies for TPU.

XLA lowers `table[idx]` gathers on TPU to ~one element per cycle on the
scalar unit — for a wavefront shading pass doing ~50 gathers per lane per
bounce this dominates the whole integrator. Two TPU-native replacements:

  * one-hot matmul ("embedding lookup as matmul"): for tables with up to a
    few thousand rows, build a (N, R) one-hot matrix and hit the MXU. A
    65K-lane x 128-row x 32-col fetch is ~0.5 GFLOP — microseconds on the
    MXU vs milliseconds of scalar gathers.
  * packed row gather: one gather of a (R, K) row matrix moves K contiguous
    floats per index instead of K separate scalar gathers.

`gather_rows` picks automatically based on the static table size.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

ONE_HOT_MAX_ROWS = 2048


def one_hot_matmul_gather(table: Array, idx: Array) -> Array:
    """table (R, K) f32, idx (N,) int -> (N, K) via one-hot matmul (MXU)."""
    r, k = table.shape
    rp = -(-r // 128) * 128
    tp = jnp.pad(table, ((0, rp - r), (0, 0)))
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, rp), 1)
    onehot = (idx.astype(jnp.int32)[:, None] == iota).astype(table.dtype)
    return jnp.dot(onehot, tp, preferred_element_type=jnp.float32)


def gather_rows(table: Array, idx: Array) -> Array:
    """(R, K) rows by (N,) indices -> (N, K); one-hot matmul for small R."""
    r = table.shape[0]
    if r <= ONE_HOT_MAX_ROWS:
        return one_hot_matmul_gather(table, idx)
    return table[idx]
