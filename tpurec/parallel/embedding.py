"""Explicit sharded embedding lookup over the model axis.

The default path lets GSPMD partition ``jnp.take`` from the row-sharded
table.  This module is the explicit formulation for full control of the
collective: under ``shard_map`` each model-axis shard holds rows
``[shard_start, shard_start + rows_per_shard)``; a lookup

  1. localizes ids:   local = ids - shard_start
  2. masks out-of-range ids, clamps, gathers locally
  3. psums the masked partial rows over the model axis — every id lives in
     exactly one shard, so the sum IS the lookup (the all-to-all exchange
     of looked-up rows, SURVEY.md §2.7, expressed as a reduction XLA maps
     onto ICI).

Batch rows stay sharded over the data axis throughout; only the gathered
[local_B, F, D] activations cross the ICI.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_table(table, mesh: Mesh, model_axis: str = "model"):
    """Place a [V, D] table row-sharded over the model axis (pads V up to a
    multiple of the axis size)."""
    n = mesh.shape[model_axis]
    V, D = table.shape
    V_pad = (V + n - 1) // n * n
    if V_pad != V:
        table = jnp.pad(table, ((0, V_pad - V), (0, 0)))
    return jax.device_put(table, NamedSharding(mesh, P(model_axis, None)))


def sharded_embedding_lookup(
    table,
    ids,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """table [V, D] row-sharded over ``model``; ids [B, F] sharded over
    ``data`` -> [B, F, D] sharded over ``data``, replicated over ``model``.
    """
    n_shards = mesh.shape[model_axis]
    V = table.shape[0]
    assert V % n_shards == 0, "pad the table first (shard_table)"
    rows_per_shard = V // n_shards

    def local_lookup(tbl, ids):
        # tbl: [rows_per_shard, D] (this shard's rows); ids: [local_B, F]
        shard_id = jax.lax.axis_index(model_axis)
        start = shard_id * rows_per_shard
        local = ids.astype(jnp.int32) - start
        in_range = (local >= 0) & (local < rows_per_shard)
        safe = jnp.clip(local, 0, rows_per_shard - 1)
        rows = jnp.take(tbl, safe, axis=0)  # [local_B, F, D]
        rows = jnp.where(in_range[..., None], rows, 0.0)
        # every id belongs to exactly one shard: the psum IS the exchange
        return jax.lax.psum(rows, axis_name=model_axis)

    return jax.shard_map(
        local_lookup,
        mesh=mesh,
        in_specs=(P(model_axis, None), P(data_axis, None)),
        out_specs=P(data_axis, None, None),
    )(table, ids)
