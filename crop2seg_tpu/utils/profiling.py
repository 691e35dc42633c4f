"""Profiling / model-characteristics utilities.

TPU-native analogues of the reference's opt-in profiling helpers
(/root/reference/src/learning/utils.py:535-608):
- ``model_characteristics``: parameter count + analytic FLOPs from the XLA
  cost analysis of the jitted forward on the reference's fixed
  1 x 30 x 10 x 128 x 128 probe (replaces thop/fvcore MACs).
- ``inference_time``: warmed repeated-latency measurement (replaces the
  CUDA-event timer). Under the axon relay, execution is lazy until data is
  fetched, so each timed call fetches the output to host.
- ``trace``: context manager around jax.profiler for on-demand device traces.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


def count_params(variables) -> int:
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(variables.get("params", variables)))


def model_characteristics(model, variables=None, batch_shape=(1, 30, 128, 128, 10)
                          ) -> Dict[str, float]:
    """Params + compiled-graph FLOP estimate on the reference probe shape
    (learning/utils.py:544: sample 1x30x10x128x128)."""
    b, t, h, w, c = batch_shape
    x = jnp.zeros(batch_shape, jnp.float32)
    dates = jnp.tile((jnp.arange(t, dtype=jnp.float32))[None], (b, 1))
    mask = jnp.zeros((b, t), bool)
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), x, dates,
                               pad_mask=mask, train=False)
    fwd = jax.jit(lambda v, x, d, m: model.apply(v, x, d, pad_mask=m,
                                                 train=False))
    lowered = fwd.lower(variables, x, dates, mask)
    cost = lowered.compile().cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else (cost or {})
    return {
        "n_params": count_params(variables),
        "flops": float(cost.get("flops", float("nan"))),
        "bytes_accessed": float(cost.get("bytes accessed", float("nan"))),
    }


def inference_time(fn: Callable, args, repetitions: int = 100,
                   warmup: int = 5) -> Dict[str, float]:
    """Mean/std latency in ms (reference learning/utils.py:569-608).

    ``fn`` should be jitted; output is fetched each rep to force execution
    through the lazy axon relay.
    """
    for _ in range(warmup):
        jax.tree_util.tree_map(np.asarray, fn(*args))
    times = []
    for _ in range(repetitions):
        t0 = time.perf_counter()
        jax.tree_util.tree_map(np.asarray, fn(*args))
        times.append((time.perf_counter() - t0) * 1000)
    times = np.asarray(times)
    return {"mean_ms": float(times.mean()), "std_ms": float(times.std()),
            "p50_ms": float(np.percentile(times, 50)),
            "p99_ms": float(np.percentile(times, 99))}


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax_trace"):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepMeter:
    """Streaming steps/sec + patches/sec meter for the train loop
    (the BASELINE headline metric)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self.steps = 0
        self.samples = 0

    def update(self, batch_size: int):
        self.steps += 1
        self.samples += batch_size

    def rates(self) -> Dict[str, float]:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return {"steps_per_sec": self.steps / dt,
                "samples_per_sec": self.samples / dt}
