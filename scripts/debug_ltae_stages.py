#!/usr/bin/env python
"""Isolate which stage of the fused L-TAE kernel miscompiles on TPU:
run a copy of the kernel that also emits intermediates, compare each against
the interpret-mode run of the SAME kernel (identical math; only Mosaic
lowering differs)."""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, N, C = 1, 61, 256, 64
N_HEAD, D_K, D_MODEL, D_OUT = 16, 4, 256, 64
RB = 16


def _kernel(x_ref, pe_ref, mask_ref, win_ref, bin_ref, u_ref, cs_ref,
            h_ref, sc_ref, at_ref, o_ref, *, n_head, eps=1e-5):
    t, r, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    d_model = win_ref.shape[1]
    g = n_head
    c_g = c // g

    def grouping(n_ch, dt=jnp.float32):
        rows = jax.lax.broadcasted_iota(jnp.int32, (n_ch, g), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n_ch, g), 1)
        return (rows // (n_ch // g) == cols).astype(dt)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    sg_c = grouping(c)
    mask_row = mask_ref[0, 0]
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    cnt = float(t * c_g)
    sum_t = jnp.sum(xf, axis=0)
    sumsq_t = jnp.sum(xf * xf, axis=0)
    mean = mm(sum_t, sg_c) / cnt
    var = mm(sumsq_t, sg_c) / cnt - mean * mean
    mean_big = mm(mean, sg_c.T)
    inv_big = mm(jax.lax.rsqrt(var + eps), sg_c.T)
    xn = (xf - mean_big[None]) * inv_big[None]

    h = mm(xn.reshape(t * r, c), win_ref[:]) + bin_ref[:][None]
    h = h.reshape(t, r, d_model) + pe_ref[0][:, None, :]
    h2 = h.reshape(t * r, d_model)
    h_ref[0] = h[0]  # stage 1: first-timestep embedding

    scores = mm(h2, u_ref[:]) + cs_ref[:]
    scores = scores.reshape(t, r, g)

    scores_t = jnp.swapaxes(jnp.swapaxes(scores, 0, 1), 1, 2).reshape(r * g, t)
    sc_ref[0] = scores_t.reshape(r, g, t)  # stage 2 (post-transpose scores)
    scores_t = jnp.where(mask_row[None, :] > 0.5, -1e6, scores_t)
    smax = jnp.max(scores_t, axis=1, keepdims=True)
    e = jnp.exp(scores_t - smax)
    attn = e / jnp.sum(e, axis=1, keepdims=True)
    a_rgt = attn.reshape(r, g, t)
    at_ref[0] = a_rgt  # stage 3

    a_trg = jnp.swapaxes(jnp.swapaxes(a_rgt, 1, 2), 0, 1)
    attn_big = mm(a_trg.reshape(t * r, g), grouping(d_model).T)
    o = jnp.sum((attn_big * h2).reshape(t, r, d_model),
                axis=0, dtype=jnp.float32)
    o_ref[0] = o  # stage 4


def run(interpret):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, N, C)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((B, T, D_MODEL)), jnp.float32)
    mask = np.zeros((B, 1, T), np.float32)
    mask[:, :, 55:] = 1.0
    mask = jnp.asarray(mask)
    win = jnp.asarray(rng.standard_normal((C, D_MODEL)) * 0.1, jnp.float32)
    bin_ = jnp.asarray(rng.standard_normal((D_MODEL,)) * 0.1, jnp.float32)
    u = jnp.asarray(rng.standard_normal((D_MODEL, N_HEAD)) * 0.1, jnp.float32)
    cs = jnp.asarray(rng.standard_normal((1, N_HEAD)) * 0.1, jnp.float32)

    kernel = functools.partial(_kernel, n_head=N_HEAD)
    vec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    grid = (B, N // RB)
    out = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, RB, C), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D_MODEL), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(), vec(), vec(), vec()],
        out_specs=[
            pl.BlockSpec((1, RB, D_MODEL), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB, N_HEAD, T), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB, N_HEAD, T), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB, D_MODEL), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, D_MODEL), jnp.float32),
            jax.ShapeDtypeStruct((B, N, N_HEAD, T), jnp.float32),
            jax.ShapeDtypeStruct((B, N, N_HEAD, T), jnp.float32),
            jax.ShapeDtypeStruct((B, N, D_MODEL), jnp.float32)],
        interpret=interpret,
    )(x, pe, mask, win, bin_, u, cs)
    return [np.asarray(o) for o in out]


if __name__ == "__main__":
    ref = run(True)
    tpu = run(False)
    for name, a, b in zip(["h[t=0]", "scores", "attn", "o"], ref, tpu):
        err = np.abs(a - b).max()
        print(f"{name}: max err {err:.3e}  finite={np.isfinite(b).all()}")
