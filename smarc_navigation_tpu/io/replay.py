"""Chunked mission replay with checkpoint/resume and health guards.

The reference has no checkpointing at all — estimator state lives in node
memory and persistence means rosbag recording (SURVEY.md §5). Here replays
of arbitrarily long missions run as a sequence of jitted ``lax.scan`` chunks
(one compile, reused across chunks and missions); filter state snapshots to
disk every K chunks and replays resume from the latest snapshot. NaN/health
guards run per chunk — the dropout masks in the timeline are the fault-
injection mechanism, this is the detection side.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.timeline import Timeline


class ReplayError(RuntimeError):
    pass


def _tree_slice(tree, a, b):
    return jax.tree_util.tree_map(lambda x: x[a:b], tree)


def save_checkpoint(path: str, state, tick_idx: int) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez(
        path,
        tick_idx=tick_idx,
        n_leaves=len(leaves),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_checkpoint(path: str, state_like):
    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(state_like)
    leaves = [
        jnp.asarray(data[f"leaf_{i}"], leaves_like[i].dtype)
        for i in range(int(data["n_leaves"]))
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves), int(data["tick_idx"])


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = sorted(
        (f for f in os.listdir(ckpt_dir) if f.startswith("ckpt_") and f.endswith(".npz")),
        key=lambda f: int(f.split("_")[1].split(".")[0]),
    )
    return os.path.join(ckpt_dir, cands[-1]) if cands else None


def run_chunked(
    step_fn: Callable,          # (state, tick) -> (state, out)
    state0,
    timeline: Timeline,
    chunk_size: int = 512,
    ckpt_dir: Optional[str] = None,
    ckpt_every_chunks: int = 4,
    validate: bool = True,
    resume: bool = True,
):
    """Replay ``timeline`` through ``step_fn`` in compiled chunks.

    Returns (final_state, outs) where outs leaves are stacked over all T
    ticks (padding ticks at the tail of the last chunk are trimmed).
    """
    T = timeline.num_ticks
    n_chunks = -(-T // chunk_size)
    pad = n_chunks * chunk_size - T
    if pad:
        tl_pad = jax.tree_util.tree_map(
            lambda x: jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)]), timeline
        )
    else:
        tl_pad = timeline

    # donate the carry: the filter state buffer is reused across chunks
    # instead of reallocating (matters for (6, 10^6) particle banks)
    @functools.partial(jax.jit, donate_argnums=0)
    def run_chunk(state, chunk):
        return jax.lax.scan(step_fn, state, chunk)

    # copy once so donation never invalidates the caller's state0
    state = jax.tree_util.tree_map(jnp.array, state0)
    start_chunk = 0
    if ckpt_dir:
        os.makedirs(ckpt_dir, exist_ok=True)
        if resume:
            ck = latest_checkpoint(ckpt_dir)
            if ck:
                state, tick_idx = load_checkpoint(ck, state0)
                start_chunk = tick_idx // chunk_size

    outs = []
    for c in range(start_chunk, n_chunks):
        chunk = _tree_slice(tl_pad, c * chunk_size, (c + 1) * chunk_size)
        state, out = run_chunk(state, chunk)
        if validate:
            finite = all(
                bool(jnp.isfinite(l).all())
                for l in jax.tree_util.tree_leaves(state)
                if jnp.issubdtype(l.dtype, jnp.floating)
            )
            if not finite:
                raise ReplayError(
                    f"non-finite filter state after chunk {c} "
                    f"(ticks {c * chunk_size}..{(c + 1) * chunk_size})"
                )
        outs.append(jax.device_get(out))
        if ckpt_dir and ((c + 1) % ckpt_every_chunks == 0 or c == n_chunks - 1):
            save_checkpoint(
                os.path.join(ckpt_dir, f"ckpt_{(c + 1) * chunk_size}.npz"),
                state,
                (c + 1) * chunk_size,
            )

    if not outs:  # resumed past the end: nothing left to replay
        return state, None
    merged = jax.tree_util.tree_map(lambda *xs: np.concatenate(xs, axis=0), *outs)
    merged = jax.tree_util.tree_map(lambda x: x[: T - start_chunk * chunk_size], merged)
    return state, merged


def profile_replay(step_fn, state0, timeline: Timeline, trace_dir: str):
    """Wrap a replay in a jax.profiler trace (SURVEY §5 'tracing/profiling':
    the reference had only ROS_INFO prints)."""
    with jax.profiler.trace(trace_dir):
        final, out = run_chunked(step_fn, state0, timeline, ckpt_dir=None,
                                 validate=False)
        jax.block_until_ready(jax.tree_util.tree_leaves(final)[0])
    return final, out
