"""Missions-in-lanes Pallas kernels for the SLAM data-association stage.

The SLAM fleet tick is bound by per-op dispatch overhead (~8 us/XLA op on
this backend): the Jonker-Volgenant assignment alone costs ~1.1 ms per
fleet tick as a vmapped while_loop of tiny ops. This module re-expresses it
as one Mosaic program with the mission axis in the VPU lanes.

``hungarian_lanes`` is the EXACT JV shortest-augmenting-path algorithm of
``ops.assignment.hungarian`` (same duals, same tie behavior through the
same min-reduction order), restructured for lockstep lanes:

* every per-lane data-dependent access (p[j0], cost column i0) becomes a
  one-hot mask + reduction — 2-3 row ops instead of a gather;
* the per-column Dijkstra loop is unrolled to its EXACT worst case: when
  augmenting column c, only the c previously-assigned rows can be
  non-terminal, so at most c+1 row expansions happen — 36 total for 8
  columns (the dense-XLA while_loop runs the same bound in the worst lane);
* lanes that reach a free row early freeze their state behind `done` masks
  (identical semantics to exiting the loop).

Cost layout: (R, C) per mission -> lane-major (C, R, B) blocks so each
column's slack update is a full-sublane (R, B) row op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e30


def _jv_lanes(costblks, R, C):
    """In-lanes JV. costblks: list of C arrays (R, B) — cost[:, c] per block.

    Returns col_to_row: list of C (1, B) f32 row indices (-1 never occurs:
    every column has a candidate row by construction of the SLAM table).
    All quantities are jnp values (pure; runs inside a kernel trace)."""
    B = costblks[0].shape[1]
    f32 = jnp.float32
    R1 = R + 1
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (R1, 1), 0).astype(f32)
    inf = jnp.full((1, B), _INF, f32)
    zero1 = jnp.zeros((1, B), f32)

    # p[r]: column assigned to row r (-1 free); row R is the virtual root
    p = jnp.full((R1, B), -1.0, f32)
    v = jnp.zeros((R1, B), f32)
    u = [jnp.zeros((1, B), f32) for _ in range(C)]

    def onehot(j):                       # (1,B) row index -> (R1,B) mask
        return iota_r == j

    def pick(rows, j):                   # rows (R1,B) gathered at per-lane j
        return jnp.sum(jnp.where(onehot(j), rows, 0.0), axis=0, keepdims=True)

    col_to_row = []
    for c in range(C):
        p = jnp.where(onehot(float(R)), float(c), p)
        minv = jnp.concatenate([jnp.full((R, B), _INF, f32),
                                jnp.full((1, B), -_INF, f32)], axis=0)
        way = jnp.full((R1, B), float(R), f32)
        used = jnp.concatenate([jnp.zeros((R, B), bool),
                                jnp.ones((1, B), bool)], axis=0)
        # col_used[c']: column c' sits on a used row (drives the u update)
        col_used = [jnp.zeros((1, B), bool) for _ in range(C)]
        col_used[c] = jnp.ones((1, B), bool)      # root carries column c
        j0 = jnp.full((1, B), float(R), f32)
        done = jnp.zeros((1, B), bool)

        for _it in range(c + 1):
            i0 = pick(p, j0)                               # (1,B) col at j0
            has = i0 >= 0.0
            u_i0 = sum(jnp.where(i0 == float(cc), u[cc], 0.0)
                       for cc in range(C))
            cur = sum(jnp.where(i0 == float(cc), costblks[cc], 0.0)
                      for cc in range(C))                  # (R,B)
            cur = cur - u_i0 - v[:R]
            cur = jnp.where(has, cur, _INF)
            better = (cur < minv[:R]) & (~used[:R]) & (~done)
            minv = jnp.concatenate(
                [jnp.where(better, cur, minv[:R]), minv[R:]], axis=0)
            way = jnp.concatenate(
                [jnp.where(better, j0, way[:R]), way[R:]], axis=0)

            masked = jnp.where(used[:R], _INF, minv[:R])
            delta = jnp.min(masked, axis=0, keepdims=True)          # (1,B)
            is_min = masked == delta
            j1 = jnp.min(jnp.where(is_min, iota_r[:R], float(R)),
                         axis=0, keepdims=True)                     # (1,B)

            # dual update (frozen lanes keep their state)
            act = ~done
            for cc in range(C):
                u[cc] = jnp.where(act & col_used[cc], u[cc] + delta, u[cc])
            v = jnp.where(act & used, v - delta, v)
            minv = jnp.concatenate(
                [jnp.where(act[0:1] & ~used[:R], minv[:R] - delta, minv[:R]),
                 minv[R:]], axis=0)

            oh1 = onehot(j1)
            used = used | (oh1 & act)
            i1 = pick(p, j1)
            for cc in range(C):
                col_used[cc] = col_used[cc] | (act & (i1 == float(cc)))
            reached_free = i1 < 0.0
            j0 = jnp.where(act, j1, j0)
            done = done | reached_free

        # augment: walk the predecessor chain from j0 back to the root
        fin = jnp.zeros((1, B), bool)
        j = j0
        for _k in range(c + 2):
            at_root = j == float(R)
            j1 = pick(way, j)
            pj1 = pick(p, j1)
            write = onehot(j) & (~fin) & (~at_root)
            p = jnp.where(write, pj1, p)
            fin = fin | at_root
            j = jnp.where(fin, j, j1)
        p = jnp.where(onehot(float(R)), -1.0, p)

    for c in range(C):
        hit = p[:R] == float(c)                              # (R,B)
        col_to_row.append(
            jnp.sum(jnp.where(hit, iota_r[:R], 0.0), axis=0, keepdims=True))
    return col_to_row


def _make_jv_kernel(R: int, C: int):
    def kernel(cost_ref, out_ref):
        # cost (C*R, B): column c's block at rows [cR, (c+1)R)
        costblks = [cost_ref[c * R:(c + 1) * R, :] for c in range(C)]
        ctr = _jv_lanes(costblks, R, C)
        for c in range(C):
            out_ref[c:c + 1, :] = ctr[c]
    return kernel


@functools.partial(jax.jit, static_argnames=())
def hungarian_lanes(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact JV assignment for a fleet: cost (B, R, C) -> col_to_row (B, C).

    Same optimum as ``assignment.hungarian`` per mission; one Mosaic
    program for the whole fleet instead of B vmapped while_loops."""
    B, R, C = cost.shape
    f32 = jnp.float32
    Bp = max(128, ((B + 127) // 128) * 128)
    cost_l = jnp.full((C * R, Bp), _INF, f32)
    cost_l = cost_l.at[:, :B].set(
        jnp.moveaxis(cost.astype(f32), 0, 2).transpose(1, 0, 2).reshape(C * R, B)
    )
    out = pl.pallas_call(
        _make_jv_kernel(R, C),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((max(C, 8), Bp), f32),
    )(cost_l)
    return jnp.round(out[:C, :B]).astype(jnp.int32).T
