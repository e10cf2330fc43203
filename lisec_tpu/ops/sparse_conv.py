"""O7/O8 — sparse 3D convolution: rulebook build + gather-GEMM (SURVEY.md §2.3).

Reference form: spconv-style C++/CUDA hash table producing (in, out)
index pairs per kernel offset, then gather -> GEMM -> scatter-add.

TPU-native design (SURVEY.md §7 "hard parts" #1): voxel coords arrive
**sorted by linearized cell id** (the voxelizer guarantees this, and
strided outputs are constructed sorted), so the rulebook is built with
pure vectorized binary searches — no hash table, no atomics:

  * For every output voxel o and kernel offset k, the input voxel at
    ``coord_out[o] * stride - pad + k`` is found with ``searchsorted``
    over the sorted input cell ids.
  * The rulebook is the **dense** (K, V_out) int32 array of input
    indices (-1 = no input there). Because the output index is the
    identity, "gather-GEMM-scatter" collapses to gather-GEMM-accumulate:
    K batched (V_out, Cin) x (Cin, Cout) matmuls on the MXU with no
    scatter at all — the TPU-shaped formulation of spconv.
  * Strided (non-submanifold) conv additionally needs the output active
    set: all candidate output coords are generated (V_in * K), sorted,
    and deduplicated into a fixed ``max_out`` budget with the same
    segment trick the voxelizer uses.

Everything is static-shape and differentiable (gather grad = XLA
scatter-add), so SECOND's middle encoder trains under jit/shard_map.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SparseConvSpec(NamedTuple):
    """Static geometry of one sparse conv layer."""

    kernel_size: Tuple[int, int, int]     # (kz, ky, kx)
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    grid_in: Tuple[int, int, int]         # (nz, ny, nx)

    @property
    def grid_out(self) -> Tuple[int, int, int]:
        return tuple(
            (g + 2 * p - k) // s + 1
            for g, k, s, p in zip(
                self.grid_in, self.kernel_size, self.stride, self.padding)
        )

    @property
    def num_offsets(self) -> int:
        kz, ky, kx = self.kernel_size
        return kz * ky * kx

    def offsets(self) -> jax.Array:
        """(K, 3) int32 kernel offsets in (z, y, x) order."""
        kz, ky, kx = self.kernel_size
        oz, oy, ox = jnp.meshgrid(
            jnp.arange(kz), jnp.arange(ky), jnp.arange(kx), indexing="ij")
        return jnp.stack(
            [oz.reshape(-1), oy.reshape(-1), ox.reshape(-1)], axis=-1
        ).astype(jnp.int32)


def _lin_ids(coords: jax.Array, grid: Tuple[int, int, int]) -> jax.Array:
    """Linearize (V, 3) [z, y, x] coords; out-of-bounds/invalid -> sentinel."""
    nz, ny, nx = grid
    z, y, x = coords[:, 0], coords[:, 1], coords[:, 2]
    inb = (z >= 0) & (z < nz) & (y >= 0) & (y < ny) & (x >= 0) & (x < nx)
    lin = (z * ny + y) * nx + x
    return jnp.where(inb, lin, nz * ny * nx)


@partial(jax.jit, static_argnames=("spec", "max_out"))
def build_output_coords(
    coords_in: jax.Array,
    num_in: jax.Array,
    spec: SparseConvSpec,
    *,
    max_out: int,
) -> Tuple[jax.Array, jax.Array]:
    """Active output set of a strided sparse conv, sorted by cell id.

    coords_in: (V, 3) int32 [z,y,x], valid rows first, sorted by cell id.
    Returns (coords_out (max_out, 3) int32 with -1 padding, num_out ()).

    An output coord o is active iff some input voxel lies under some
    kernel tap: in = o * stride - pad + k  =>  o = (in + pad - k) / stride
    (when divisible and in the output grid).
    """
    v = coords_in.shape[0]
    offs = spec.offsets()                                   # (K, 3)
    stride = jnp.array(spec.stride, jnp.int32)
    pad = jnp.array(spec.padding, jnp.int32)
    go = spec.grid_out
    n_out_cells = go[0] * go[1] * go[2]

    valid_in = (jnp.arange(v) < num_in)[:, None, None]      # (V,1,1)
    num = coords_in[:, None, :] + pad[None, None, :] - offs[None, :, :]
    div_ok = (num % stride[None, None, :] == 0).all(-1)
    cand = num // stride[None, None, :]                     # (V, K, 3)
    inb = (
        (cand >= 0).all(-1)
        & (cand[..., 0] < go[0]) & (cand[..., 1] < go[1])
        & (cand[..., 2] < go[2])
    )
    ok = div_ok & inb & valid_in[..., 0]
    lin = (cand[..., 0] * go[1] + cand[..., 1]) * go[2] + cand[..., 2]
    lin = jnp.where(ok, lin, n_out_cells).reshape(-1)       # (V*K,)

    lin_sorted = jnp.sort(lin)
    prev = jnp.concatenate(
        [jnp.full((1,), -1, lin_sorted.dtype), lin_sorted[:-1]])
    is_first = (lin_sorted != prev) & (lin_sorted < n_out_cells)
    rank = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    num_out = jnp.minimum(
        jnp.where(is_first.any(), rank[-1] + 1, 0), max_out)

    slot = jnp.where(is_first & (rank < max_out), rank, max_out)
    zc = lin_sorted // (go[1] * go[2])
    yc = (lin_sorted // go[2]) % go[1]
    xc = lin_sorted % go[2]
    cands = jnp.stack([zc, yc, xc], axis=-1).astype(jnp.int32)
    out = jnp.full((max_out + 1, 3), -1, jnp.int32)
    out = out.at[slot].set(cands, mode="drop")
    return out[:max_out], num_out


@partial(jax.jit, static_argnames=("spec",))
def build_rulebook(
    coords_in: jax.Array,
    num_in: jax.Array,
    coords_out: jax.Array,
    num_out: jax.Array,
    spec: SparseConvSpec,
) -> jax.Array:
    """Dense rulebook: (K, V_out) int32 input index per output/offset.

    Entry [k, o] is the index into the input voxel list of the voxel at
    ``coord_out[o] * stride - pad + offset[k]``, or -1 if absent/invalid.
    Requires input coords sorted ascending by linearized cell id (the
    voxelizer and :func:`build_output_coords` both guarantee it).
    """
    v_in = coords_in.shape[0]
    v_out = coords_out.shape[0]
    lin_in = _lin_ids(coords_in, spec.grid_in)              # (V_in,)
    sentinel = spec.grid_in[0] * spec.grid_in[1] * spec.grid_in[2]
    lin_in = jnp.where(jnp.arange(v_in) < num_in, lin_in, sentinel)

    offs = spec.offsets()                                   # (K, 3)
    stride = jnp.array(spec.stride, jnp.int32)
    pad = jnp.array(spec.padding, jnp.int32)

    valid_out = (jnp.arange(v_out) < num_out)[None, :]
    tap = (coords_out[None, :, :] * stride[None, None, :]
           - pad[None, None, :] + offs[:, None, :])         # (K, V_out, 3)
    lin_tap = _lin_ids(tap.reshape(-1, 3), spec.grid_in).reshape(
        offs.shape[0], v_out)

    pos = jnp.searchsorted(lin_in, lin_tap)                 # (K, V_out)
    pos_c = jnp.minimum(pos, v_in - 1)
    hit = (lin_in[pos_c] == lin_tap) & (lin_tap < sentinel) & valid_out
    return jnp.where(hit, pos_c, -1).astype(jnp.int32)


@jax.jit
def sparse_conv3d(
    features: jax.Array,
    rulebook: jax.Array,
    weights: jax.Array,
    bias: jax.Array | None = None,
) -> jax.Array:
    """Gather-GEMM-accumulate sparse convolution.

    features: (V_in, Cin); rulebook: (K, V_out); weights: (K, Cin, Cout).
    Returns (V_out, Cout). Each offset is one MXU matmul over the full
    padded voxel list; masked gathers read a zero row for -1 entries.
    """
    v_in, cin = features.shape
    k, v_out = rulebook.shape
    feats_pad = jnp.concatenate(
        [features, jnp.zeros((1, cin), features.dtype)], axis=0)
    idx = jnp.where(rulebook >= 0, rulebook, v_in)          # (K, V_out)
    gathered = feats_pad[idx]                               # (K, V_out, Cin)
    out = jax.lax.dot_general(
        gathered, weights,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                       # (K, V_out, Cout)
    y = jnp.sum(out, axis=0)
    if bias is not None:
        y = y + bias
    return y.astype(features.dtype)
