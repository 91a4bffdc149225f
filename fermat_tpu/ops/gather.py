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
    """table (R, K) f32, idx (N,) int -> (N, K) via one-hot matmul (MXU).

    XLA materializes the (N, Rp) one-hot matrix in HBM (~130 MB at N=256K,
    Rp=128) — fine on CPU, dominant cost on TPU; the Pallas variant below
    keeps it in VMEM."""
    r, k = table.shape
    rp = -(-r // 128) * 128
    tp = jnp.pad(table, ((0, rp - r), (0, 0)))
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, rp), 1)
    onehot = (idx.astype(jnp.int32)[:, None] == iota).astype(table.dtype)
    return jnp.dot(onehot, tp, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _onehot_kernel(idx_ref, table_ref, out_ref):
    blk = idx_ref.shape[0]
    rp = table_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, rp), 1)
    onehot = (idx_ref[:] == iota).astype(jnp.float32)  # (blk, rp) in VMEM
    out_ref[:] = jnp.dot(onehot, table_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _pallas_onehot_gather(table: Array, idx: Array, block: int = 1024) -> Array:
    """Blocked one-hot matmul: the (BLK, Rp) one-hot never leaves VMEM."""
    from jax.experimental import pallas as pl

    n = idx.shape[0]
    r, k = table.shape
    rp = -(-r // 128) * 128
    tp = jnp.pad(table.astype(jnp.float32), ((0, rp - r), (0, 0)))
    n_pad = -(-n // block) * block
    idx2 = jnp.pad(idx.astype(jnp.int32), (0, n_pad - n)).reshape(n_pad, 1)
    g = n_pad // block
    out = pl.pallas_call(
        _onehot_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
            pl.BlockSpec((rp, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block, k), lambda i: (i, 0)),
        interpret=jax.default_backend() == "cpu",
    )(idx2, tp)
    return out[:n]


@jax.custom_vjp
def _pallas_onehot_gather_diff(table: Array, idx: Array) -> Array:
    return _pallas_onehot_gather(table, idx)


def _pog_fwd(table, idx):
    return _pallas_onehot_gather(table, idx), (idx, table.shape[0])


def _pog_bwd(res, g):
    """d table = onehot(idx)^T @ g — an XLA transpose matmul.

    Without this rule the TPU train path NEVER worked: pallas_call has no
    JVP/VJP, and any jax.grad through a shade whose row tables carry
    tangents (materials joined into shade_rows) died with "Linearization
    failed ..." on hardware — unseen until round 4 because every gradient
    test runs the CPU backend, which takes the XLA one-hot path.
    The backward materializes the (N, Rp) one-hot in HBM; that is the
    train-step price only — forward rendering never executes it."""
    idx, r = res
    rp = -(-r // 128) * 128
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, rp), 1)
    oh = (idx.astype(jnp.int32)[:, None] == iota).astype(g.dtype)
    dt = jax.lax.dot_general(
        oh, g, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (Rp, K)
    return dt[:r], None


_pallas_onehot_gather_diff.defvjp(_pog_fwd, _pog_bwd)


def gather_rows(table: Array, idx: Array) -> Array:
    """(R, K) rows by (N,) indices -> (N, K); one-hot matmul for small R."""
    r = table.shape[0]
    if r <= ONE_HOT_MAX_ROWS:
        if jax.default_backend() in ("tpu", "axon") and r <= 4096:
            return _pallas_onehot_gather_diff(table, idx)
        return one_hot_matmul_gather(table, idx)
    return table[idx]
