"""Device mesh + sharding rules (TPU-native scaling).

The reference is strictly single-device (SURVEY.md §2: no DDP / NCCL / MPI
anywhere); scaling here is first-class: a ``jax.sharding.Mesh`` over the
``data`` axis (optionally a ``space`` axis for spatial sharding of whole-tile
inference), batch arrays annotated with NamedSharding, parameters replicated,
and XLA GSPMD inserting the gradient/metric all-reduces over ICI.

For n_devices > batch the flattened pixel-row axis of the L-TAE is the
natural second axis — attention rows are independent, so spatial sharding
needs no cross-device attention communication (SURVEY.md §5).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, axis_names=tuple(axes))


def batch_spec(batch: Dict[str, Any], axis: str = "data") -> Dict[str, P]:
    """PartitionSpec tree sharding the leading (batch) dim of every array."""
    return {k: P(axis) for k in batch}


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data"):
    """Place a host batch onto the mesh, sharded along its leading dim."""
    return {
        k: jax.device_put(v, NamedSharding(mesh, P(axis)))
        for k, v in batch.items()
    }


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def data_parallel_step(step_fn, mesh: Mesh, axis: str = "data",
                       donate_state: bool = True):
    """Wrap a (state, batch, rng) -> (state, aux) step for the mesh.

    State replicated, batch sharded on ``axis``; GSPMD derives the gradient
    all-reduce. Metric confusion matrices come back replicated (summed).
    """
    repl = NamedSharding(mesh, P())
    # pytree-prefix in_shardings: one sharding per argument broadcasts over
    # that argument's leaves — the documented contract (state replicated,
    # batch sharded on ``axis``, rng replicated) is ENFORCED by jit rather
    # than relying on every caller remembering replicate(state, mesh).
    jitted = jax.jit(
        step_fn,
        in_shardings=(repl, NamedSharding(mesh, P(axis)), repl),
        donate_argnums=(0,) if donate_state else ())

    def wrapped(state, batch, rng):
        batch = shard_batch(batch, mesh, axis)
        return jitted(state, batch, rng)

    return wrapped


def data_parallel_eval(step_fn, mesh: Mesh, axis: str = "data"):
    jitted = jax.jit(step_fn)

    def wrapped(state, batch):
        batch = shard_batch(batch, mesh, axis)
        return jitted(state, batch)

    return wrapped


def patch_parallel_infer(fwd_fn, mesh: Mesh, axis: str = "data",
                         extra_replicated: int = 0):
    """Whole-tile inference sharding (SURVEY.md §5: "whole-tile inference
    shards the 100 patches across chips").

    Wraps a ``(variables, patch_batch) -> outputs`` forward so the leading
    (patch) axis of the batch splits across the mesh's ``axis`` while the
    parameters stay replicated; outputs are gathered back replicated so the
    host fetch sees the full batch. The model is batch-parallel, so GSPMD
    inserts no communication beyond the output gather over ICI.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))
    jitted = jax.jit(fwd_fn,
                     in_shardings=(repl, shard) + (repl,) * extra_replicated,
                     out_shardings=repl)

    def wrapped(variables, patch_batch, *extra):
        n = mesh.shape[axis]
        b = (patch_batch.shape[0] if hasattr(patch_batch, "shape")
             else len(patch_batch))
        if b % n:
            raise ValueError(
                f"patch batch {b} must divide over {n} '{axis}' devices")
        return jitted(variables, patch_batch, *extra)

    return wrapped


def shard_batch_2d(batch: Dict[str, Any], mesh: Mesh,
                   data_axis: str = "data", space_axis: str = "space"):
    """Shard batch over (data, space): x (B, T, H, W, C) splits B across the
    data axis and H across the space axis — GSPMD inserts halo exchanges for
    the spatial convs and the attention needs no cross-device traffic
    (per-pixel rows, SURVEY.md §5). y/pad_mask/dates shard accordingly."""
    spec = {
        "x": P(data_axis, None, space_axis),
        "dates": P(data_axis),
        "pad_mask": P(data_axis),
        "y": P(data_axis, space_axis),
    }
    return {
        k: jax.device_put(v, NamedSharding(mesh, spec.get(k, P(data_axis))))
        for k, v in batch.items()
    }


def data_space_parallel_step(step_fn, mesh: Mesh, donate_state: bool = True):
    """Train-step wrapper for a 2-D (data, space) mesh."""
    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate_state else ())

    def wrapped(state, batch, rng):
        batch = shard_batch_2d(batch, mesh)
        return jitted(state, batch, rng)

    return wrapped
