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
import numpy as np


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
    go = spec.grid_out
    n_out_cells = go[0] * go[1] * go[2]

    # Per axis, an input voxel reaches output coords o with
    # 0 <= in + pad - o*stride <= ksz-1, i.e. at most ceil(ksz/stride)
    # consecutive o's — enumerate THOSE (8 for the canonical 3/2 conv)
    # instead of all K=27 kernel taps (round-3 profile: this builder
    # cost 22.6 ms/batch-4 per level, dominated by the V*K candidate
    # sort).
    n_ax = [-(-k // s) for k, s in zip(spec.kernel_size, spec.stride)]
    axes = []
    for ax in range(3):
        k, s, p = (spec.kernel_size[ax], spec.stride[ax],
                   spec.padding[ax])
        hi = (coords_in[:, ax] + p) // s                    # largest o
        d = jnp.arange(n_ax[ax], dtype=jnp.int32)
        o = hi[:, None] - d[None, :]                        # (V, n_ax)
        ok = ((o >= 0) & (o < go[ax])
              & (coords_in[:, ax:ax + 1] + p - o * s <= k - 1))
        axes.append((o, ok))
    oz, okz = axes[0]
    oy, oky = axes[1]
    ox, okx = axes[2]
    lin = ((oz[:, :, None, None] * go[1] + oy[:, None, :, None]) * go[2]
           + ox[:, None, None, :])
    ok = (okz[:, :, None, None] & oky[:, None, :, None]
          & okx[:, None, None, :]
          & (jnp.arange(v) < num_in)[:, None, None, None])
    lin = jnp.where(ok, lin, n_out_cells).reshape(-1)       # (V*8,)

    lin_sorted = jnp.sort(lin)
    prev = jnp.concatenate(
        [jnp.full((1,), -1, lin_sorted.dtype), lin_sorted[:-1]])
    is_first = (lin_sorted != prev) & (lin_sorted < n_out_cells)
    rank = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    num_out = jnp.minimum(
        jnp.where(is_first.any(), rank[-1] + 1, 0), max_out)

    # Compact the firsts with a second (cheap) sort instead of a
    # data-dependent scatter.
    ckey = jnp.where(is_first & (rank < max_out), lin_sorted,
                     n_out_cells)
    compact = jnp.sort(ckey)[:max_out]
    keep = compact < n_out_cells
    zc = compact // (go[1] * go[2])
    yc = (compact // go[2]) % go[1]
    xc = compact % go[2]
    out = jnp.where(keep[:, None],
                    jnp.stack([zc, yc, xc], axis=-1).astype(jnp.int32),
                    -1)
    return out, num_out


@partial(jax.jit, static_argnames=("spec", "max_out"))
def build_footprint_coords(
    coords_in: jax.Array,
    num_in: jax.Array,
    spec: SparseConvSpec,
    *,
    max_out: int,
) -> Tuple[jax.Array, jax.Array]:
    """Sparsity-RETAINING output set of a strided conv: each input cell
    activates only the output cell whose stride-footprint contains it
    (o = (in + pad - (k-1)//2) // stride), not the full 3^3-dilated
    touched set that `build_output_coords` enumerates.

    The stride-2 3^3 downsample DILATES the active set ~3-4x per level
    on KITTI geometry (6.4k input voxels -> 19.5k/24.9k true actives at
    levels 1/2 — benchmarks/profile_second_budgets.py), which is what
    makes the canonical sparse middle encoder expensive on static
    budgets. Restricting outputs to the footprint set keeps |out| <=
    |in| (strictly shrinking as neighbors merge), the same
    sparsity-retention idea as Sparse PointPillars / VoxelNeXt-style
    pruned downsampling. The conv itself is unchanged — all K taps
    gather over the restricted output set via the ordinary rulebook —
    so values at kept cells equal the dense conv's values there.

    coords_in: (V, 3) int32 [z,y,x], valid rows first, sorted by cell
    id. Returns (coords_out (max_out, 3), num_out ()) sorted by cell id.
    """
    v = coords_in.shape[0]
    go = spec.grid_out
    n_out_cells = go[0] * go[1] * go[2]

    os_ = []
    ok = (jnp.arange(v) < num_in)
    for ax in range(3):
        k, s, p = (spec.kernel_size[ax], spec.stride[ax],
                   spec.padding[ax])
        o = (coords_in[:, ax] + p - (k - 1) // 2) // s
        ok = ok & (o >= 0) & (o < go[ax])
        os_.append(o)
    lin = (os_[0] * go[1] + os_[1]) * go[2] + os_[2]
    lin = jnp.where(ok, lin, n_out_cells)                   # (V,)

    lin_sorted = jnp.sort(lin)
    prev = jnp.concatenate(
        [jnp.full((1,), -1, lin_sorted.dtype), lin_sorted[:-1]])
    is_first = (lin_sorted != prev) & (lin_sorted < n_out_cells)
    rank = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    num_out = jnp.minimum(
        jnp.where(is_first.any(), rank[-1] + 1, 0), max_out)
    ckey = jnp.where(is_first & (rank < max_out), lin_sorted,
                     n_out_cells)
    compact = jnp.sort(ckey)[:max_out]
    keep = compact < n_out_cells
    zc = compact // (go[1] * go[2])
    yc = (compact // go[2]) % go[1]
    xc = compact % go[2]
    out = jnp.where(keep[:, None],
                    jnp.stack([zc, yc, xc], axis=-1).astype(jnp.int32),
                    -1)
    return out, num_out


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


@partial(jax.jit, static_argnames=("spec",))
def build_subm_scatter_rulebook(
    coords: jax.Array,         # (B, V, 3) int32 [z,y,x] sorted
    num: jax.Array,            # (B,)
    spec: SparseConvSpec,
) -> jax.Array:
    """Submanifold (out set == in set, stride 1) scatter rulebook with
    HALF the merge sorts of the general builder.

    Three structural facts of the k^3 stride-1 self-rulebook (round 4):
      * the center offset is the IDENTITY map;
      * offset k and its point-mirror K-1-k are INVERSE partial
        permutations of each other: input i feeds output o under k
        iff cell[o] = cell[i] + (pad - off_k), and the mirror negates
        the shift;
      * each offset's map is MONOTONE over its valid entries (adding a
        constant cell shift preserves sort order), so the inverse is a
        1-channel slab-paint (route i to row out_of[i]) — no extra
        merge sort.
    So only offsets 0..K//2-1 go through the tag-merge; the rest come
    from one batched paint + arithmetic.

    MEASURED NEGATIVE (round 4, same-session A/B at KITTI L0 geometry,
    benchmarks/profile_second.py): 18.0 ms vs 10.9 ms for the
    27-merge general builder — the 8-lane inversion paint's window
    scans waste 15/16 of every vreg (narrow-lane pathology, docs/
    ARCHITECTURE.md lesson #7) and cost more than the 13 saved merge
    sorts. Kept as the reference implementation of the mirror-inverse
    identity (equality-tested vs the general builder); the encoder
    uses build_scatter_rulebook.
    """
    from lisec_tpu.ops.pallas.pillar_paint import segment_paint

    b, v, _ = coords.shape
    k = spec.num_offsets
    assert k % 2 == 1, "submanifold kernel must have odd tap count"
    half = k // 2
    first = _scatter_rulebook_offsets(
        coords, num, coords, num, spec, tuple(range(half)))  # (B,half,V)

    ident = jnp.where(jnp.arange(v)[None] < num[:, None],
                      jnp.arange(v, dtype=jnp.int32)[None], -1)

    # Invert each of the first-half maps with a paint: vals carry the
    # source index (+1 so 0 means "no source"), routed to row
    # out_of[i]; invalid rows are zeroed and their targets monotonized
    # (a zero sum lands harmlessly on an earlier row).
    flat = first.reshape(b * half, v)
    validf = flat >= 0
    src = jnp.where(
        validf, jnp.arange(v, dtype=jnp.float32)[None] + 1.0, 0.0)
    tgt = jnp.maximum(jax.lax.cummax(flat, axis=1), 0)
    width = 8
    vals = jnp.concatenate(
        [src[..., None], jnp.zeros((b * half, v, width - 2)),
         jnp.ones((b * half, v, 1))], axis=-1)
    interpret = jax.devices()[0].platform != "tpu"
    tab = segment_paint(
        vals.astype(jnp.float32), tgt, num_cells=v, num_max=0,
        count_channel=width - 1, slab=2048, window=512,
        interpret=interpret, exact=True)
    inv = (jnp.round(tab[..., 0]).astype(jnp.int32) - 1).reshape(
        b, half, v)                                   # -1 where empty
    # Full-K order: [0..half-1 direct, center identity, then the
    # mirrors — offset K-1-m for m in half+1..K-1 is the inverse of
    # offset K-1-m, i.e. the inverses in REVERSED offset order].
    return jnp.concatenate(
        [first, ident[:, None], jnp.flip(inv, axis=1)], axis=1)


@partial(jax.jit, static_argnames=("spec",))
def build_scatter_rulebook(
    coords_in: jax.Array,      # (B, V_in, 3) int32 [z,y,x] sorted
    num_in: jax.Array,         # (B,)
    coords_out: jax.Array,     # (B, V_out, 3) int32 sorted
    num_out: jax.Array,        # (B,)
    spec: SparseConvSpec,
) -> jax.Array:
    """Scatter-form rulebook: (B, K, V_in) int32 — the OUTPUT index each
    input voxel feeds under kernel offset k, or -1.

    The gather-form rulebook + searchsorted costs ~6M binary-search
    probes per frame (measured 277 ms/batch-4 for one level — gathers
    run at ~2 GB/s on TPU). Here membership+rank are found by a
    MERGE: for each offset, the input's target out-cell ids and the
    (unique, sorted) out-cell list are co-sorted with tags; a query row
    matches iff its immediate predecessor is the out row of the same
    cell (for a fixed (k, out) the input is unique, so also at most one
    query per cell). One batched `lax.sort` call handles all (B, K)
    rows. An inverse 2-key sort returns results in input order.
    """
    return _scatter_rulebook_offsets(
        coords_in, num_in, coords_out, num_out, spec,
        tuple(range(spec.num_offsets)))


@partial(jax.jit, static_argnames=("spec", "offs_idx"))
def _scatter_rulebook_offsets(
    coords_in, num_in, coords_out, num_out, spec: SparseConvSpec,
    offs_idx: Tuple[int, ...],
) -> jax.Array:
    """Tag-merge scatter rulebook restricted to a static subset of
    kernel offsets (see build_scatter_rulebook for the algorithm;
    build_subm_scatter_rulebook derives the other half of a subm
    rulebook from this subset by inversion)."""
    b, v_in, _ = coords_in.shape
    v_out = coords_out.shape[1]
    go = spec.grid_out
    n_out_cells = go[0] * go[1] * go[2]
    # The packed merge key below is cell*2 + tag in int32; grids with
    # >= 2^30 cells would overflow it silently. Static under jit.
    if n_out_cells >= 2 ** 30:
        raise ValueError(
            f"grid_out {go} has {n_out_cells} cells >= 2^30; the packed "
            "int32 merge key would overflow. Use a coarser grid.")

    lin_out = jax.vmap(lambda c: _lin_ids(c, go))(
        coords_out.reshape(b, v_out, 3))                # (B, V_out)
    lin_out = jnp.where(
        jnp.arange(v_out)[None] < num_out[:, None], lin_out, n_out_cells)

    offs = spec.offsets()[jnp.asarray(offs_idx)]        # (K', 3)
    k = len(offs_idx)
    stride = jnp.array(spec.stride, jnp.int32)
    pad = jnp.array(spec.padding, jnp.int32)

    num = (coords_in[:, None, :, :] + pad[None, None, None, :]
           - offs[None, :, None, :])                    # (B, K, V_in, 3)
    div_ok = (num % stride[None, None, None, :] == 0).all(-1)
    cand = num // stride[None, None, None, :]
    inb = ((cand >= 0).all(-1)
           & (cand[..., 0] < go[0]) & (cand[..., 1] < go[1])
           & (cand[..., 2] < go[2]))
    valid_in = (jnp.arange(v_in)[None, None, :]
                < num_in[:, None, None])
    ok = div_ok & inb & valid_in
    lin_q = (cand[..., 0] * go[1] + cand[..., 1]) * go[2] + cand[..., 2]
    lin_q = jnp.where(ok, lin_q, n_out_cells)           # (B, K, V_in)

    # Merge: per (b, k) row, sort [out cells | query cells] on ONE
    # packed key cell*2 + tag (cells < 2^30, so this fits i32; one
    # 2-operand single-key sort replaces the 3-operand 2-key one),
    # carrying (out rank | input index). A query row (odd key) matches
    # iff its predecessor is the out row of the same cell, i.e.
    # prev_key == key - 1.
    key = jnp.concatenate(
        [jnp.broadcast_to(lin_out[:, None, :] * 2, (b, k, v_out)),
         lin_q * 2 + 1], axis=2)                    # (B, K, V_out+V_in)
    payload = jnp.concatenate(
        [jnp.broadcast_to(jnp.arange(v_out, dtype=jnp.int32)[None, None],
                          (b, k, v_out)),
         jnp.broadcast_to(jnp.arange(v_in, dtype=jnp.int32)[None, None],
                          (b, k, v_in))], axis=2)
    k_s, p_s = jax.lax.sort((key, payload), dimension=2, num_keys=1)

    prev_k = jnp.concatenate(
        [jnp.full((b, k, 1), -9, k_s.dtype), k_s[..., :-1]], axis=2)
    prev_p = jnp.concatenate(
        [jnp.zeros((b, k, 1), p_s.dtype), p_s[..., :-1]], axis=2)
    is_q = (k_s & 1) == 1
    matched = is_q & (prev_k == k_s - 1) & (k_s < 2 * n_out_cells)
    out_rank = jnp.where(matched, prev_p, -1)

    # Back to input order: among query rows sort by input index.
    key2 = jnp.where(is_q, p_s, v_in + v_out)
    _, out_of = jax.lax.sort((key2, out_rank), dimension=2, num_keys=1)
    return out_of[..., :v_in]                           # (B, K, V_in)


def _monotone_spread(vals: jax.Array, targets: jax.Array, valid: jax.Array,
                     num_out: int, interpret: bool,
                     pad_c: int = 0) -> jax.Array:
    """Route rows of `vals` (B', N, C) to `targets` (B', N) — monotone
    over valid entries, unique — summing into a dense (B', num_out, C)
    table via the K-reduction spread kernel (ops/pallas/spread_kernel).
    Invalid rows are zeroed and their targets monotonized with a
    running max (a zero sum lands harmlessly anywhere). `pad_c` pads
    the channel axis so call sites can share one kernel shape."""
    from lisec_tpu.ops.pallas.spread_kernel import spread_accumulate

    bb, n, c = vals.shape
    cp = max(pad_c, -(-c // 8) * 8)
    vm = jnp.where(valid[..., None], vals.astype(jnp.float32), 0.0)
    vm = _pad_axis(vm, 2, cp, 0.0)
    tgt = jax.lax.cummax(jnp.where(valid, targets, -1), axis=1)
    tgt = jnp.maximum(tgt, 0).astype(jnp.int32)
    table = spread_accumulate(
        vm.transpose(0, 2, 1)[:, None], tgt[:, None],
        num_out=num_out, interpret=interpret)
    return table[..., :c]                               # (B', num_out, C)


def _monotone_spread_cols(vals_cols: jax.Array, targets: jax.Array,
                          valid: jax.Array, num_out: int,
                          interpret: bool) -> jax.Array:
    """:func:`_monotone_spread` taking CHANNEL-LEADING values
    (B', C, N) — the spread kernel streams (C, window) blocks, so a
    column-building caller (e.g. O13's neighborhood table) skips the
    (B', N, C) materialization (minor dim C tile-pads to 128 lanes)
    AND the transpose. Output stays (B', num_out, C)."""
    from lisec_tpu.ops.pallas.spread_kernel import spread_accumulate

    bb, c, n = vals_cols.shape
    cp = -(-c // 8) * 8
    vm = jnp.where(valid[:, None, :], vals_cols.astype(jnp.float32), 0.0)
    vm = _pad_axis(vm, 1, cp, 0.0)
    tgt = jax.lax.cummax(jnp.where(valid, targets, -1), axis=1)
    tgt = jnp.maximum(tgt, 0).astype(jnp.int32)
    table = spread_accumulate(
        vm[:, None], tgt[:, None], num_out=num_out, interpret=interpret)
    return table[..., :c]                               # (B', num_out, C)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _spread_conv(features, weights, out_of, v_out, interpret, pad_c):
    """Forward: K batched MXU GEMMs, then ONE K-reduction spread — all
    27 offset streams accumulate into the shared output table inside
    the kernel (K innermost grid dim, output block VMEM-resident), with
    native-Cout-lane streams in the feature dtype. The round-2 form
    (per-offset 128-lane f32 paint tables + XLA sum over K) moved ~6 GB
    of HBM per conv; this moves ~2% of that."""
    from lisec_tpu.ops.pallas.spread_kernel import spread_accumulate

    b, v_in, cin = features.shape
    k, _, cout = weights.shape
    z = jnp.einsum("bvc,kcd->bkdv", features, weights,
                   preferred_element_type=jnp.float32)  # (B,K,Cout,V)
    # bf16 features stream bf16 (half traffic, exact single-matmul
    # routing); f32 features stream f32 (hi+mid split routing).
    z = z.astype(features.dtype
                 if features.dtype == jnp.bfloat16 else jnp.float32)
    valid = out_of >= 0
    cp = max(pad_c, -(-cout // 8) * 8)
    z = jnp.where(valid[:, :, None, :], z, 0)
    z = _pad_axis(z, 2, cp, 0.0)
    tgt = jax.lax.cummax(jnp.where(valid, out_of, -1), axis=2)
    tgt = jnp.maximum(tgt, 0).astype(jnp.int32)
    y = spread_accumulate(z, tgt, num_out=v_out, interpret=interpret)
    return y[..., :cout]


def _pad_axis(x, axis, size, fill):
    if x.shape[axis] >= size:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, size - x.shape[axis])
    return jnp.pad(x, widths, constant_values=fill)


def _spread_conv_fwd(features, weights, out_of, v_out, interpret, pad_c):
    return (_spread_conv(features, weights, out_of, v_out, interpret,
                          pad_c),
            (features, weights, out_of))


def _spread_conv_bwd(v_out, interpret, pad_c, res, g):
    """Backward = conv-transpose, also spread-form: the inverse per-
    offset map in_of(out) is monotone/unique too, so dz̃_k = g routed
    through it (one spread), then dX and dW are plain MXU einsums. The
    inverse map itself comes from a 1-channel spread of input indices.
    """
    features, weights, out_of = res
    b, v_in, cin = features.shape
    k, _, cout = weights.shape
    valid = (out_of >= 0).reshape(b * k, v_in)

    # in_of[b,k,o] = input index feeding output o under offset k (-1
    # if none): spread (index+1) through out_of; unique targets make
    # the sum an exact selection.
    idxv = jnp.broadcast_to(
        jnp.arange(v_in, dtype=jnp.float32)[None, :, None] + 1.0,
        (b * k, v_in, 1))
    tab = _monotone_spread(idxv, out_of.reshape(b * k, v_in), valid,
                           v_out, interpret)
    in_of = jnp.round(tab[..., 0]).astype(jnp.int32) - 1  # (B*K, V_out)

    # dz̃[b,k,i,:] = g[b, out_k(i), :]  ==  spread g through in_of.
    g32 = g.astype(jnp.float32)
    g_rep = jnp.broadcast_to(g32[:, None], (b, k, v_out, cout))
    dz = _monotone_spread(
        g_rep.reshape(b * k, v_out, cout), in_of, in_of >= 0,
        v_in, interpret, pad_c=pad_c).reshape(b, k, v_in, cout)

    f32 = features.astype(jnp.float32)
    dw = jnp.einsum("bvc,bkvd->kcd", f32, dz,
                    preferred_element_type=jnp.float32)
    dx = jnp.einsum("bkvd,kcd->bvc", dz,
                    weights.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    d_out_of = np.zeros(out_of.shape, dtype=jax.dtypes.float0)
    return (dx.astype(features.dtype), dw.astype(weights.dtype),
            d_out_of)


_spread_conv.defvjp(_spread_conv_fwd, _spread_conv_bwd)


@partial(jax.jit, static_argnames=("v_out", "interpret", "pad_to",
                                   "pad_c"))
def sparse_conv3d_spread(
    features: jax.Array,       # (B, V_in, Cin)
    out_of: jax.Array,         # (B, K, V_in) scatter rulebook
    weights: jax.Array,        # (K, Cin, Cout)
    *,
    v_out: int,
    interpret: bool = False,
    pad_to: int = 0,
    pad_c: int = 0,
) -> jax.Array:
    """Scatter-form sparse conv: per-offset GEMM then monotone spread.

    y[out] = Σ_k W_k · x[in_k(out)] is evaluated as: z_k = x @ W_k (K
    batched MXU matmuls), then each z_k row is ROUTED to its output row
    by the slab-paint kernel — for a fixed offset the in->out map is
    monotone (adding a constant cell offset preserves order) with
    unique targets, so the routing is a sorted unique-target sum
    spread, not a gather (measured ~2 GB/s) path. Differentiable via a
    custom VJP whose backward is the same machinery through the inverse
    map (conv-transpose). Returns (B, V_out, Cout) f32.

    `pad_to` pads BOTH the input voxel list and the output table to a
    common static size so every conv in a network shares ONE Pallas
    kernel shape — on this backend each distinct Mosaic compile costs
    ~1.5 min through the remote compiler and there is no persistent
    cache, so an 11-conv encoder would otherwise pay 11 compiles.
    """
    k, _, cout = weights.shape
    assert cout + 1 <= 128, "Cout must be < 128 for the spread kernel"
    if pad_to:
        assert pad_to >= max(v_out, features.shape[1])
        features = _pad_axis(features, 1, pad_to, 0.0)
        out_of = _pad_axis(out_of, 2, pad_to, -1)
        y = _spread_conv(features, weights, out_of, pad_to, interpret,
                         pad_c)
        return y[:, :v_out]
    return _spread_conv(features, weights, out_of, v_out, interpret,
                        pad_c)


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
