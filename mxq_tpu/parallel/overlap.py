"""Collective/compute-overlapped tensor-parallel matmuls (SURVEY.md §7.8).

GSPMD inserts all-gathers/all-reduces around sharded matmuls automatically,
but as monolithic collectives: the ICI transfer and the MXU work serialize.
These shard_map building blocks chunk the collective around the ring with
``lax.ppermute`` and interleave the chunks with the (packed dequant-)matmul,
so XLA's latency-hiding scheduler can run each hop concurrently with the
next chunk's compute — the TPU-native analogue of what the reference would
have needed NCCL stream overlap for (it has no TP at all, SURVEY.md §2.5).

Two Megatron-style patterns for one transformer block:

* ``allgather_matmul``      — column-parallel linear whose input arrives
  K-sharded (the previous row-parallel layer's reduce-scatter output). Ring:
  at step s every device multiplies the activation K-chunk it currently
  holds against the matching k-tile rows of its local (N-sharded) weight
  while the chunk travels one hop.
* ``matmul_reducescatter``  — row-parallel linear with K-sharded weights:
  each device computes partial products chunk-by-chunk along N while the
  accumulating chunk rides the ring; device d ends with output chunk d fully
  summed (reduce-scatter), ready to feed the next allgather_matmul.

Both take a ``matmul`` callable so they work for dense bf16 ([K, N] array)
and packed MXQ weights alike; k-tile/N-chunk slicing of packed planes is
provided by ``slice_ktiles`` / ``slice_ncols``.

Correctness is pinned against single-device references on the 8-virtual-CPU
mesh (tests/test_overlap.py). Real ICI overlap can only be profiled on
multi-chip hardware; the structure (independent per-chunk dots + ppermute
chains) is what the XLA scheduler overlaps.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import shard_map

from mxq_tpu.packfmt import NB_TILE, PackedMXQLinear

KT_COLS = NB_TILE * 64          # input columns covered by one k-tile (1024)


def slice_ktiles(p: PackedMXQLinear, t0: int, n_tiles: int) -> PackedMXQLinear:
    """Packed sub-linear covering k-tiles [t0, t0+n_tiles): rows t0*KT_COLS
    onward of the logical [K, N] weight. Exactly additive: summing partial
    products over disjoint tile ranges equals the full matmul (per-channel
    4-bit scales in smeta4 are K-independent). ``t0`` may be traced."""
    def sl(a, rows_per_tile):
        return jax.lax.dynamic_slice_in_dim(
            a, t0 * rows_per_tile, n_tiles * rows_per_tile, axis=0)

    # in_features is static (t0 may be traced): K-sharding requires K to be
    # a multiple of KT_COLS so every tile range is fully real columns.
    assert p.in_features % KT_COLS == 0, \
        "K-sharded packed matmul needs in_features divisible by 1024"
    return PackedMXQLinear(
        w2=sl(p.w2, NB_TILE * 3), w4=sl(p.w4, NB_TILE * 2),
        meta2=sl(p.meta2, NB_TILE), qscale=sl(p.qscale, NB_TILE),
        qmin=sl(p.qmin, NB_TILE), smeta4=p.smeta4,
        in_features=n_tiles * KT_COLS,
        out_features=p.out_features)


def slice_ncols(p: PackedMXQLinear, c0, n_cols: int) -> PackedMXQLinear:
    """Packed sub-linear covering output columns [c0, c0+n_cols) of the
    padded N axis. ``c0`` may be traced; ``n_cols`` must be a multiple of
    the lane tile. out_features of the slice is the full padded chunk (the
    caller trims once at the end)."""
    def sl(a):
        return jax.lax.dynamic_slice_in_dim(a, c0, n_cols, axis=1)

    return PackedMXQLinear(
        w2=sl(p.w2), w4=sl(p.w4), meta2=sl(p.meta2), qscale=sl(p.qscale),
        qmin=sl(p.qmin), smeta4=sl(p.smeta4),
        in_features=p.in_features, out_features=n_cols)


def localize(p: PackedMXQLinear) -> PackedMXQLinear:
    """Fix up the static in/out_features of a packed linear whose ARRAY
    leaves were sharded by shard_map (static fields don't split): the local
    geometry is whatever the local planes actually hold."""
    import dataclasses
    return dataclasses.replace(
        p,
        in_features=min(p.in_features, p.meta2.shape[0] * 64),
        out_features=min(p.out_features, p.meta2.shape[1]))


def packed_specs(p: PackedMXQLinear, shard: str):
    """PartitionSpec pytree for a packed linear under shard_map.

    ``shard="n"``: column-parallel — every plane splits its lane (N) axis.
    ``shard="k"``: row-parallel — k-tile planes split axis 0; the per-channel
    smeta4 stays replicated.
    """
    from jax.sharding import PartitionSpec as P
    if shard == "n":
        leaf = {f: P(None, "tp") for f in
                ("w2", "w4", "meta2", "qscale", "qmin", "smeta4")}
    else:
        leaf = {f: P("tp", None) for f in
                ("w2", "w4", "meta2", "qscale", "qmin")}
        leaf["smeta4"] = P(None, None)
    return PackedMXQLinear(in_features=p.in_features,
                           out_features=p.out_features, **leaf)


def allgather_matmul(x_shard: jax.Array, w_local, matmul: Callable,
                     axis_name: str, *, n_ktiles_local: int):
    """Column-parallel y_local = allgather_K(x) @ w_local, overlapped.

    Call INSIDE shard_map. ``x_shard`` [B, K/tp] is this device's K-chunk
    (chunk d holds k-tiles [d*n_ktiles_local, ...)); ``w_local`` holds full
    K for the local N columns. At ring step s the device multiplies the
    chunk it holds (origin (d+s) mod tp) against the matching k-tiles of
    w_local, then passes the chunk along; every hop overlaps the next
    partial product.

    ``w_local`` may be a tuple of weights: one ring pass feeds them all
    (e.g. gate + up of an MLP), returning a tuple of outputs.
    """
    assert n_ktiles_local >= 1, \
        "K-sharding granularity is one k-tile (1024 cols): need K >= tp*1024"
    tp = jax.lax.psum(1, axis_name)
    d = jax.lax.axis_index(axis_name)
    perm = [(i, (i - 1) % tp) for i in range(tp)]   # chunk moves d -> d-1
    ws = w_local if isinstance(w_local, tuple) else (w_local,)
    ws = tuple(localize(w) if isinstance(w, PackedMXQLinear) else w
               for w in ws)

    def tile_mm(w, origin, xc):
        wk = (slice_ktiles(w, origin * n_ktiles_local, n_ktiles_local)
              if isinstance(w, PackedMXQLinear)
              else jax.lax.dynamic_slice_in_dim(
                  w, origin * n_ktiles_local * KT_COLS,
                  n_ktiles_local * KT_COLS, axis=0))
        return matmul(xc, wk)

    accs = [tile_mm(w, d, x_shard) for w in ws]
    xc = x_shard
    for s in range(1, tp):
        xc = jax.lax.ppermute(xc, axis_name, perm)
        # the ppermute hop overlaps these independent partial products
        accs = [a + tile_mm(w, (d + s) % tp, xc)
                for a, w in zip(accs, ws)]
    return tuple(accs) if isinstance(w_local, tuple) else accs[0]


def matmul_reducescatter(x_local: jax.Array, w_local, matmul: Callable,
                         axis_name: str, *, chunk_cols: int):
    """Row-parallel y_chunk_d = sum_over_devices(x_local @ w_local)[:, d-th
    N-chunk], overlapped (ring reduce-scatter fused with the matmul).

    Call INSIDE shard_map. ``w_local`` holds this device's K-shard for ALL N
    (``chunk_cols`` * tp padded columns); output chunk j accumulates around
    the ring starting at device (j+1) mod tp and lands at device j after
    tp-1 hops, each hop overlapping the next chunk's local partial matmul.
    """
    tp = jax.lax.psum(1, axis_name)
    d = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % tp) for i in range(tp)]   # acc moves d -> d+1
    if isinstance(w_local, PackedMXQLinear):
        assert w_local.meta2.shape[0] >= 16, \
            "K-sharding granularity is one k-tile (1024 cols): " \
            "need K >= tp*1024"
        w_local = localize(w_local)

    def chunk_mm(j):
        wc = (slice_ncols(w_local, j * chunk_cols, chunk_cols)
              if isinstance(w_local, PackedMXQLinear)
              else jax.lax.dynamic_slice_in_dim(w_local, j * chunk_cols,
                                                chunk_cols, axis=1))
        return matmul(x_local, wc)

    acc = chunk_mm((d - 1) % tp)
    for s in range(1, tp):
        nxt = chunk_mm((d - 1 - s) % tp)    # independent of the hop below
        acc = jax.lax.ppermute(acc, axis_name, perm) + nxt
    return acc


def tp_packed_mlp(mesh, x_kshard, gate, up, down, matmul,
                  *, n_ktiles_local: int, chunk_cols: int):
    """A whole Megatron-style MLP block with BOTH collectives chunked and
    overlapped: one ring pass all-gathers x while computing gate AND up
    partials per hop (column-parallel, N-sharded), silu(gate)*up locally,
    then the down projection (row-parallel, K-sharded) rides the
    reduce-scatter ring — the SURVEY §7.8 'collective-overlapped
    dequant-GEMM' applied to the decoder MLP (2/3 of decode FLOPs).
    Activations stay K-sharded between blocks."""
    from jax.sharding import PartitionSpec as P

    def fn(x, g, u, dn):
        gl, ul = allgather_matmul(x, (g, u), matmul, "tp",
                                  n_ktiles_local=n_ktiles_local)
        h = (jax.nn.silu(gl.astype(jnp.float32))
             * ul.astype(jnp.float32)).astype(x.dtype)
        return matmul_reducescatter(h, dn, matmul, "tp",
                                    chunk_cols=chunk_cols)

    def spec(w, kind):
        if isinstance(w, PackedMXQLinear):
            return packed_specs(w, kind)
        return P(None, "tp") if kind == "n" else P("tp", None)

    return shard_map.shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, "tp"), spec(gate, "n"), spec(up, "n"),
                  spec(down, "k")),
        out_specs=P(None, "tp"),
        check_rep=False)(x_kshard, gate, up, down)


def tp_block_matmuls(mesh, x_kshard, w_col, w_row, matmul,
                     *, n_ktiles_local: int, chunk_cols: int):
    """One overlapped column-parallel -> row-parallel pair under shard_map:
    y = (allgather_K(x) @ w_col) @ w_row, returned K-sharded (reduce-scatter
    output), i.e. the steady-state TP dataflow where activations stay
    sharded between blocks and every collective is a chunked ring."""
    from jax.sharding import PartitionSpec as P

    def fn(x, wc, wr):
        h = allgather_matmul(x, wc, matmul, "tp",
                             n_ktiles_local=n_ktiles_local)
        return matmul_reducescatter(h, wr, matmul, "tp",
                                    chunk_cols=chunk_cols)

    wc_spec = (packed_specs(w_col, "n")
               if isinstance(w_col, PackedMXQLinear) else P(None, "tp"))
    wr_spec = (packed_specs(w_row, "k")
               if isinstance(w_row, PackedMXQLinear) else P("tp", None))
    return shard_map.shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, "tp"), wc_spec, wr_spec),
        out_specs=P(None, "tp"),
        check_rep=False)(x_kshard, w_col, w_row)
