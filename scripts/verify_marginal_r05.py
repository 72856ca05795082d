"""Round-5 verify flow: drive the marginal-writeback SLAM kernel fleet
end-to-end through the public package boundary.

Flows:
  1. run_fleet(update_mode="marginal") on a 2-mission MBES fleet — the
     pose-rows+band kernel path — vs the dense per-mission marginal path
     (``run(update_mode="marginal")``): association agreement must be 1.0,
     trajectories within kernel-reassociation tolerance.
  2. full-update fleet on the same missions — sanity that both semantics
     track the same ground truth (final pose error of the same order).

On CPU the Pallas kernels run under ``pltpu.force_tpu_interpret_mode()``
(the axon chip runs them natively — pass --tpu).

Usage:
  JAX_PLATFORMS=cpu python scripts/verify_marginal_r05.py        (CPU)
  PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/verify_marginal_r05.py --tpu                (chip)
"""

import contextlib
import dataclasses
import sys

import numpy as np


def main():
    on_tpu = "--tpu" in sys.argv
    import jax

    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    import smarc_navigation_tpu  # noqa: F401
    from smarc_navigation_tpu.configs import EKFSlamConfig
    from smarc_navigation_tpu.models import ekf_slam as slam
    from smarc_navigation_tpu.parallel import fleet

    sys.path.insert(0, "/root/repo/tests")
    from test_slam_fleet import _slam_tls

    cfg = dataclasses.replace(
        EKFSlamConfig(), max_landmarks=16, max_obs=4,
        mhl_dist_mbes=1.0, q_mbes_diag=(0.1,) * 3, r_diag=(1e-3,) * 6)
    params = slam.make_params(cfg)
    tls = _slam_tls(cfg, 8.0, [1, 2])
    batched = fleet.batch_timelines(tls)

    ctx = (contextlib.nullcontext() if on_tpu
           else pltpu.force_tpu_interpret_mode())
    with ctx:
        final_m, out_m = slam.run_fleet(batched, params, cfg,
                                        update_mode="marginal")
        final_f, out_f = slam.run_fleet(batched, params, cfg)
        for b, tl in enumerate(tls):
            fd, od = slam.run(tl, params, cfg, update_mode="marginal")
            agree = (np.asarray(out_m["matched_mbes"][:, b])
                     == np.asarray(od["matched_mbes"])).mean()
            derr = np.abs(np.asarray(out_m["mu"][:, b])
                          - np.asarray(od["mu"])).max()
            print(f"flow1 mission {b}: association agreement {agree:.3f}, "
                  f"max |d mu| vs dense marginal {derr:.4f}")
            assert agree == 1.0 and derr < 1e-2

        mm = np.asarray(out_m["mu"])   # (T, B, 6)
        mf = np.asarray(out_f["mu"])
        gap = np.abs(mm - mf)[:, :, 0:3].max()
        print(f"flow2 marginal vs full fleet: max |d pos| = {gap:.3f} m, "
              f"n_active marginal {np.asarray(final_m.n_active)} "
              f"full {np.asarray(final_f.n_active)}")
        assert np.isfinite(mm).all() and gap < 5.0

    print("VERIFY_OK")


if __name__ == "__main__":
    main()
