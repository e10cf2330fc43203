"""Pallas one-hot MXU gather/scatter for ARBITRARY row indices.

XLA:TPU executes data-dependent gathers and scatter-adds at ~2 GB/s
effective regardless of hints (benchmarks/profile_scatter.py). The
sorted-stream kernels (paint/unpaint/spread) exploit ordering; this
pair handles the UNsorted case — PointNet++ neighbor grouping (O4) and
3-NN interpolation gathers (O5), whose index sets are arbitrary — by
keeping the whole source table VMEM-resident and routing rows with
one-hot matmuls:

  * gather:  out[m] = src[idx[m]]   == onehot(idx) @ src
  * scatter: acc[n] += Σ_{m: idx[m]=n} val[m] == onehot(idx)^T @ val
    (the gather's transpose/VJP; duplicate indices accumulate)

Both run the MXU at matmul speed instead of the scatter unit. The
constraint is VMEM residency of the (N, C) table (~bf16 N*C*2 bytes;
callers fall back to XLA gathers above the budget). bf16 tables route
exactly in one matmul; f32 tables use the hi+mid split (~2^-17
relative, the paint-kernel precision).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Keep the resident table + accumulators well under the ~16 MB scoped
# VMEM budget.
VMEM_TABLE_BYTES = 4 * 1024 * 1024


def fits_vmem(n: int, c: int, dtype) -> bool:
    return n * c * jnp.dtype(dtype).itemsize <= VMEM_TABLE_BYTES


def _gather_kernel(src_ref, idx_ref, out_ref, *, n: int, f32: bool):
    idx = idx_ref[0]                                       # (Tm, 1)
    src = src_ref[0]                                       # (N, C)
    tm = idx.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    onehot = (cols == idx).astype(jnp.bfloat16)            # (Tm, N)
    dn = (((1,), (0,)), ((), ()))

    def route(x):
        return jax.lax.dot_general(
            onehot, x, dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    if f32:
        hi = src.astype(jnp.bfloat16)
        mid = (src - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = route(hi) + route(mid)
    else:
        out = route(src)
    out_ref[0] = out.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("tile_m", "interpret"))
def gather_rows_mxu(
    src: jax.Array,        # (B, N, C) f32 or bf16
    idx: jax.Array,        # (B, M) int32; out of [0, N) -> zero row
    *,
    tile_m: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """out[b, m] = src[b, idx[b, m]] at MXU speed; (B, M, C) in src
    dtype."""
    b, n, c = src.shape
    m = idx.shape[1]
    mp = -(-m // tile_m) * tile_m
    idx = jnp.concatenate(
        [idx.astype(jnp.int32),
         jnp.full((b, mp - m), -1, jnp.int32)], axis=1)

    out = pl.pallas_call(
        partial(_gather_kernel, n=n, f32=src.dtype == jnp.float32),
        grid=(b, mp // tile_m),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda b_, t_: (b_, 0, 0)),
            pl.BlockSpec((1, tile_m, 1), lambda b_, t_: (b_, t_, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_m, c), lambda b_, t_: (b_, t_, 0)),
        out_shape=jax.ShapeDtypeStruct((b, mp, c), src.dtype),
        interpret=interpret,
    )(src, idx[..., None])
    return out[:, :m]


def _scatter_kernel(val_ref, idx_ref, out_ref, *, n: int, f32: bool):
    t = pl.program_id(1)
    idx = idx_ref[0]                                       # (Tm, 1)
    val = val_ref[0]                                       # (Tm, C)
    tm = idx.shape[0]

    @pl.when(t == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    cols = jax.lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    onehot = (cols == idx).astype(jnp.bfloat16)            # (Tm, N)
    dn = (((0,), (0,)), ((), ()))                          # contract Tm

    def route(x):
        return jax.lax.dot_general(
            onehot, x, dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    if f32:
        hi = val.astype(jnp.bfloat16)
        mid = (val - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        add = route(hi) + route(mid)
    else:
        add = route(val)
    out_ref[0] = out_ref[0] + add.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("num_rows", "tile_m", "interpret"))
def scatter_rows_mxu(
    vals: jax.Array,       # (B, M, C)
    idx: jax.Array,        # (B, M) int32; out of [0, num_rows) dropped
    *,
    num_rows: int,
    tile_m: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """out[b, n] = Σ_{m: idx[b,m]=n} vals[b, m] — (B, num_rows, C) f32.

    The gather's transpose (duplicates accumulate); used as its VJP.
    """
    b, m, c = vals.shape
    mp = -(-m // tile_m) * tile_m
    vals = jnp.concatenate(
        [vals.astype(jnp.float32),
         jnp.zeros((b, mp - m, c), jnp.float32)], axis=1)
    idx = jnp.concatenate(
        [idx.astype(jnp.int32),
         jnp.full((b, mp - m), -1, jnp.int32)], axis=1)

    out = pl.pallas_call(
        partial(_scatter_kernel, n=num_rows, f32=True),
        grid=(b, mp // tile_m),                            # t innermost
        in_specs=[
            pl.BlockSpec((1, tile_m, c), lambda b_, t_: (b_, t_, 0)),
            pl.BlockSpec((1, tile_m, 1), lambda b_, t_: (b_, t_, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, num_rows, c), lambda b_, t_: (b_, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, num_rows, c), jnp.float32),
        interpret=interpret,
    )(vals, idx[..., None])
    return out


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows(src, idx, interpret=False):
    """Differentiable MXU gather: (B, N, C) x (B, M) -> (B, M, C)."""
    return gather_rows_mxu(src, idx, interpret=interpret)


def _gather_fwd(src, idx, interpret):
    return gather_rows_mxu(src, idx, interpret=interpret), (src, idx)


def _gather_bwd(interpret, res, g):
    src, idx = res
    dsrc = scatter_rows_mxu(g, idx, num_rows=src.shape[1],
                            interpret=interpret)
    return dsrc.astype(src.dtype), None


gather_rows.defvjp(_gather_fwd, _gather_bwd)
