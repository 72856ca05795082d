"""On-chip proof of the mission-sharded SLAM kernel fleet (round-3 verdict
#4): ``slam.run_fleet(device_mesh=...)`` and the kernel path of
``fleet.run_raycast_fleet(device_mesh=...)`` wrap the WHOLE lanes-kernel
scan in one shard_map over the mesh's ``mission`` axis, so multi-chip
fleets keep kernel speed instead of falling back to the ~2.8x-slower
vmapped GSPMD path.

CPU interpret-mode Pallas is unreliable inside shard_map (the round-3
resample finding; the DA/update kernels hang the same way), so the
composition is proven HERE on the real chip with a mission=1 mesh — the
only mesh one chip can host. Missions are independent (no collectives),
so a 1-shard mesh runs exactly the code an N-shard mesh runs per shard;
outputs must be BITWISE the unsharded fleet's.

Writes ``data/slam_shard_tpu.json``; ``tests/test_slam_fleet.py`` pins the
committed artifact. Run in a FOREGROUND shell (axon env).
"""
import dataclasses
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import smarc_navigation_tpu  # noqa: F401  (forces matmul precision)
from smarc_navigation_tpu.configs import EKFSlamConfig
from smarc_navigation_tpu.io import workloads
from smarc_navigation_tpu.models import ekf_slam as slam
from smarc_navigation_tpu.ops import raycast
from smarc_navigation_tpu.parallel import fleet, mesh as mesh_lib

dev = jax.devices()[0]
print(f"# device: {dev}", file=sys.stderr, flush=True)
assert dev.platform == "tpu", "this harness must run on the real chip"

out = {"device": str(dev), "mesh": {"mission": 1, "particle": 1}}
pm = mesh_lib.make_mesh(mission=1, particle=1)

# --- 1. slam.run_fleet: lanes kernels inside shard_map --------------------
cfg = dataclasses.replace(
    EKFSlamConfig(), max_landmarks=64, max_obs=8,
    mhl_dist_mbes=1.0, q_mbes_diag=(0.1, 0.1, 0.1), r_diag=(1e-3,) * 6)
params = slam.make_params(cfg)
B = 8
tl = workloads.slam_fleet_timelines(cfg, 10.0, B)

f_ref, o_ref = jax.jit(lambda t: slam.run_fleet(t, params, cfg))(tl)
f_sh, o_sh = jax.jit(
    lambda t: slam.run_fleet(t, params, cfg, device_mesh=pm))(tl)
bit_mu = bool((np.asarray(f_sh.mu) == np.asarray(f_ref.mu)).all())
bit_sig = bool((np.asarray(f_sh.Sigma) == np.asarray(f_ref.Sigma)).all())
bit_out = bool(
    (np.asarray(o_sh["mu"]) == np.asarray(o_ref["mu"])).all()
    and (np.asarray(o_sh["matched_mbes"])
         == np.asarray(o_ref["matched_mbes"])).all())
n_act = int(np.asarray(f_sh.n_active).sum())
out["slam_run_fleet_sharded"] = {
    "B": B, "ticks": int(tl.ticks.shape[1]), "bitwise_mu": bit_mu,
    "bitwise_sigma": bit_sig, "bitwise_outputs": bit_out,
    "total_landmarks": n_act,
}
print(f"slam.run_fleet sharded: mu bitwise={bit_mu} Sigma bitwise={bit_sig} "
      f"outputs bitwise={bit_out} landmarks={n_act}", flush=True)
assert bit_mu and bit_sig and bit_out

# --- 2. raycast closed loop: kernel fleet inside shard_map -----------------
rng = np.random.default_rng(0)
T = 64
ticks = np.arange(T) / cfg.system_freq
from smarc_navigation_tpu.io import sim

m = sim.simulate(sim.MissionSpec(duration_s=T / cfg.system_freq + 1))
gt = jnp.asarray(np.tile(m.gt_at(ticks).astype(np.float32), (B, 1, 1)))
lms = jnp.asarray(
    rng.uniform([0, -10, -15], [6, 10, -13], (B, 6, 3)), jnp.float32)
lmm = jnp.ones((B, 6), bool)
spec = raycast.MBESSpec(num_beams=32)

fr_ref, (mu_ref, _) = jax.jit(lambda g, l, mm: fleet.run_raycast_fleet(
    g, l, mm, cfg, params, spec, use_da_kernel=True))(gt, lms, lmm)
fr_sh, (mu_sh, _) = jax.jit(lambda g, l, mm: fleet.run_raycast_fleet(
    g, l, mm, cfg, params, spec, device_mesh=pm, use_da_kernel=True))(
        gt, lms, lmm)
bit_rc = bool(
    (np.asarray(fr_sh.mu) == np.asarray(fr_ref.mu)).all()
    and (np.asarray(mu_sh) == np.asarray(mu_ref)).all())
out["raycast_fleet_sharded"] = {
    "B": B, "ticks": T, "bitwise": bit_rc,
    "total_landmarks": int(np.asarray(fr_sh.n_active).sum()),
}
print(f"raycast kernel fleet sharded: bitwise={bit_rc}", flush=True)
assert bit_rc

path = os.path.join(os.path.dirname(__file__), "..", "data",
                    "slam_shard_tpu.json")
with open(os.path.abspath(path), "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(f"wrote {os.path.abspath(path)}", flush=True)
