"""Frozen configuration dataclasses.

The reference scatters its tunables over rosparam defaults in node
constructors and launch files (SURVEY.md §5 "Config / flag system"). Every
default below is frozen to the canonical launch-file value, with the source
cited, so replays reproduce the reference's operating points exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class EKFLocConfig:
    """auv_ekf_localization (``launch/ekf_localization.launch:8-13``,
    ctor defaults ``src/ekf_localization.cpp:54-71``)."""

    system_freq: float = 50.0
    delta_outlier_reject: float = 0.9           # chi2(3) gate quantile
    sigma0_diag: Tuple[float, ...] = (2.0, 2.0, 2.0, 1.0, 1.0, 1.0)
    r_diag: Tuple[float, ...] = (1.0, 1.0, 1.0, 1e-3, 1e-3, 1e-3)
    q_diag: Tuple[float, ...] = (40.0, 45.0, 40.0)
    # landmark pre-gate epsilon (``ekf_localization.cpp:483,508``)
    epsilon: float = 10.0
    # stone-volume offset subtracted from y,z of each detection
    # (``ekf_localization.cpp:489-492``)
    stone_offset: float = 0.7071067811865475  # 1/sqrt(2)
    dvl_window: int = 5                        # Bézier window (deque size)
    max_obs: int = 8                           # padded detections per tick
    max_landmarks: int = 64                    # padded known-map size


@dataclasses.dataclass(frozen=True)
class EKFSlamConfig:
    """auv_ekf_slam (``launch/ekf_slam.launch:23-30``, new-landmark covs
    ``src/ekf_slam_core.cpp:227,236``, beacon cov ``src/ekf_slam.cpp:168-173``)."""

    system_freq: float = 10.0
    delta_outlier_reject: float = 0.9
    mhl_dist_mbes: float = 0.12   # new-landmark diagonal cost, MBES
    mhl_dist_fls: float = 1.0     # new-landmark diagonal cost, FLS
    sigma0_diag: Tuple[float, ...] = (0.1,) * 6
    r_diag: Tuple[float, ...] = (0.001,) * 6
    q_mbes_diag: Tuple[float, ...] = (200.0, 200.0, 200.0)
    q_fls_diag: Tuple[float, ...] = (600.0, 100.0)
    new_lm_cov_mbes: Tuple[float, ...] = (100.0, 100.0, 100.0)
    new_lm_cov_fls: Tuple[float, ...] = (400.0, 200.0, 1000.0)
    beacon_cov: Tuple[float, ...] = (20.0, 10.0, 10.0)
    outlier_cost: float = 10000.0  # "infinite" cost (``ekf_slam_core.cpp:175``)
    fls_scale_px_per_m: float = 400.0 / 17.0  # ``correspondence_obj_fls.cpp:27``
    max_landmarks: int = 256      # padded landmark slots (reference grows unbounded)
    max_obs: int = 16             # padded detections per tick


@dataclasses.dataclass(frozen=True)
class OdomProviderConfig:
    """auv_odom_provider (``src/odom_provider.cpp:62-96``,
    ``launch/ekf_slam.launch:9``)."""

    system_freq: float = 30.0
    dvl_window: int = 5           # size_dvl_q_ (``odom_provider.cpp:78``)
    dvl_stale_s: float = 0.02     # staleness gate (``odom_provider.cpp:291``)
    # 1-D KF smoother params per DVL axis (``odom_provider.cpp:94-96``)
    kf_mu0: float = 0.0
    kf_sigma0: float = 1.0
    kf_r: float = 10.0
    kf_q: float = 20.0


@dataclasses.dataclass(frozen=True)
class DRConfig:
    """sam_dead_reckoning dr_node (``launch/sam_dr.launch:60-61``,
    gates ``scripts/dr_node.py:179-186``)."""

    dr_period: float = 0.02
    dvl_period: float = 0.1
    dvl_vy_max: float = 0.2
    dvl_vx_max: float = 1.5
    dvl_vx_min: float = -0.1
    thrust_vec_max_rad: float = 7.0 * 3.141592653589793 / 180.0


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    """SAM motion model constants (``scripts/sam_mm.py:10-30,70-100``)."""

    mass: float = 15.4
    izz: float = 1.6202
    x_g: float = 0.4
    y_g: float = 0.0
    kt: float = 0.3
    rpm_scale: float = 1.0
    d_scale: float = -1.0


@dataclasses.dataclass(frozen=True)
class PFConfig:
    """auv_particle_filter (``launch/auv_pf.launch:15-20``,
    ``scripts/auv_pf.py:26-56``)."""

    particle_count: int = 50
    init_cov: Tuple[float, ...] = (0.1, 0.1, 0.0, 0.0, 0.0, 0.0)
    motion_cov: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0, 0.0, 1e-12)
    res_noise_cov: Tuple[float, ...] = (1.0, 1.0, 0.0, 0.0, 0.0, 1e-4)
    measurement_std: float = 1.0


@dataclasses.dataclass(frozen=True)
class OneDKFConfig:
    """Scalar sensor smoother (``noise_oneD_kf.cpp:17-37``)."""

    mu0: float = 0.0
    sigma0: float = 1.0
    r: float = 10.0
    q: float = 20.0
