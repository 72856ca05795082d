"""On-chip proof of the pallas+shard_map composition (round-3 verdict #2).

CPU interpret-mode Pallas deadlocks inside shard_map, so the distributed
resample's Pallas variant (``resample_dist.systematic_gather_shard(
use_pallas=True)``) has no CPU execution evidence — this harness runs the
code path a pod would execute on the REAL chip, on a particle=1 mesh (the
only mesh one chip can host; the collectives degenerate to no-ops but the
pallas_call executes inside the shard_map body, which is exactly the
composition interpret mode cannot run):

  1. ``systematic_resample_gather_dist(use_pallas=True)`` at N=2^17 —
     asserted BITWISE against the single-device
     ``resampling.systematic_resample`` gather (and the XLA shard body for
     comparison).
  2. The public fast replay ``pf.run(use_pallas=True, pmesh=...)`` — the
     whole mission scan (fused Pallas predict + distributed resample)
     inside one shard_map — asserted BITWISE against the unsharded fast
     path (r05, VERDICT r04 #3: the shard body now derives weights from
     the shard-decomposable halving-tree normalization and the resample
     jitter from the standalone kernel seeded by GLOBAL chunk index, so
     sharding is invisible in the bank, not just statistically small).
  3. The jitter stream's shard-invariance mechanism itself: one full-bank
     ``jitter_moments_call`` vs per-"shard" slices with the matching
     ``seed_off`` — bitwise, on the hardware PRNG (this is the multi-shard
     decomposition evidence one chip CAN produce; the mesh above only
     hosts P=1).

Writes ``data/dist_check_tpu.json``; ``tests/test_resample_dist.py`` pins
the committed artifact so a bad regeneration fails CI. Run in a FOREGROUND
shell (the axon TPU env does not reach background shells).
"""
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import smarc_navigation_tpu  # noqa: F401  (forces matmul precision)
from smarc_navigation_tpu.configs import PFConfig
from smarc_navigation_tpu.io import sim
from smarc_navigation_tpu.models import particle_filter as pf
from smarc_navigation_tpu.ops import resampling
from smarc_navigation_tpu.parallel import mesh as mesh_lib
from smarc_navigation_tpu.parallel import resample_dist

dev = jax.devices()[0]
print(f"# device: {dev}", file=sys.stderr, flush=True)
assert dev.platform == "tpu", "this harness must run on the real chip"

out = {"device": str(dev), "n": 1 << 17, "mesh": {"mission": 1, "particle": 1}}
pm = mesh_lib.make_mesh(mission=1, particle=1)

# --- 1. distributed resample, Pallas shard body, inside shard_map ---------
N = 1 << 17
rng = np.random.default_rng(0)
parts = jnp.asarray(rng.normal(size=(6, N)).astype(np.float32))
w = rng.exponential(1.0, N).astype(np.float32)
w = jnp.asarray(w / w.sum())
key = jax.random.PRNGKey(123)

anc = resampling.systematic_resample(key, w)
ref = np.asarray(jnp.take(parts, anc, axis=1))
for use_pallas in (False, True):
    got = np.asarray(resample_dist.systematic_resample_gather_dist(
        parts, w, key, pm, halo=2048, use_pallas=use_pallas))
    bitwise = bool(np.array_equal(got, ref))
    out[f"dist_resample_pallas={use_pallas}_bitwise"] = bitwise
    print(f"dist resample use_pallas={use_pallas}: bitwise={bitwise}",
          flush=True)
    assert bitwise, f"use_pallas={use_pallas} diverged from single-device"

# --- 2. public fast replay through pf.run(pmesh=...) ----------------------
n = 1 << 17
cfg = PFConfig(particle_count=n)
params = pf.make_params(cfg)
m = sim.simulate(sim.MissionSpec(duration_s=10.0, seed=3, gps_surface_z=-100.0))
tl = pf.pf_timeline(m, freq_hz=10.0)
n_upd = int(np.asarray(
    tl.channels["gps"].fresh & (tl.channels["diving"].value[:, 0] < 0.5)).sum())
assert n_upd >= 3, f"mission must include GPS updates (got {n_upd})"
key = jax.random.PRNGKey(7)

f_ref, o_ref = pf.run(tl, params, cfg, key=key, scheme="systematic",
                      use_pallas=True)
f_sh, o_sh = pf.run(tl, params, cfg, key=key, scheme="systematic",
                    use_pallas=True, pmesh=pm)
mean_ref = np.asarray(o_ref["mean"])
mean_sh = np.asarray(o_sh["mean"])
bank_ref = np.asarray(f_ref.particles)
bank_sh = np.asarray(f_sh.particles)
ok = np.isfinite(bank_sh).all()
bank_bitwise = bool(np.array_equal(bank_sh, bank_ref))
maxdiff = float(np.max(np.abs(mean_sh[:, 0:3] - mean_ref[:, 0:3])))
out["pf_run_fast_pmesh"] = {
    "ticks": int(tl.ticks.shape[0]), "gps_updates": n_upd,
    "finite": bool(ok), "bank_bitwise": bank_bitwise,
    "mean_pos_maxdiff_m": maxdiff,
}
print(f"pf.run fast pmesh: ticks={int(tl.ticks.shape[0])} updates={n_upd} "
      f"finite={bool(ok)} bank_bitwise={bank_bitwise} "
      f"mean-pos maxdiff {maxdiff:.4g} m", flush=True)
assert ok, "sharded fast replay produced non-finite particles"
# r05: sharding must be INVISIBLE in the bank — same weights (halving-tree
# normalization), same ancestors (shared blocked summation tree), same
# hardware-PRNG motion noise and jitter (global-chunk-index seeding)
assert bank_bitwise, "sharded fast bank not bitwise the unsharded bank"
# reported moments may carry psum-order ulps at P>1; at P=1 they are the
# same program — keep a tight numeric bound either way
assert maxdiff < 1e-5, f"sharded fast replay mean drifted {maxdiff} m"

# --- 3. jitter-stream shard decomposition (multi-shard mechanism on one
# chip): slicing the bank into P chunks and passing each slice's global
# first chunk index as seed_off must reproduce the one-call stream bitwise
from smarc_navigation_tpu.ops import pf_kernels

sd3 = jnp.asarray([0.3, 0.3, 0.02], jnp.float32)
bank = jnp.asarray(rng.normal(size=(6, N)).astype(np.float32))
full, sums_full = pf_kernels.jitter_moments_call(bank, sd3, 987654321, 0)
full = np.asarray(full)
for P_ in (2, 4):
    ns = N // P_
    pieces = [
        np.asarray(pf_kernels.jitter_moments_call(
            bank[:, s * ns:(s + 1) * ns], sd3, 987654321,
            seed_off=s * (ns // 8192))[0])
        for s in range(P_)
    ]
    same = bool(np.array_equal(np.concatenate(pieces, axis=1), full))
    out[f"jitter_seed_off_decomposition_P{P_}_bitwise"] = same
    print(f"jitter seed_off decomposition P={P_}: bitwise={same}", flush=True)
    assert same, f"jitter stream not shard-invariant at P={P_}"

path = os.path.join(os.path.dirname(__file__), "..", "data",
                    "dist_check_tpu.json")
with open(os.path.abspath(path), "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(f"wrote {os.path.abspath(path)}", flush=True)
