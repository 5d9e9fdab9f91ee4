"""Trajectory evaluation: ATE / RPE, plus per-frame metric records.

The reference has no evaluation of any kind (no tests, no metrics — its
observability is colored printf, reference: CameraTracking.cpp:37-41).
ATE RMSE versus ground truth is the headline accuracy metric
(BASELINE.json).
"""

from __future__ import annotations

import numpy as np


def umeyama_alignment(src: np.ndarray, dst: np.ndarray):
    """Least-squares rigid alignment (no scale) of two (N, 3) point sets.
    Returns (R, t) with dst ~= src @ R.T + t."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    cov = (dst - mu_d).T @ (src - mu_s) / len(src)
    U, _, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    t = mu_d - R @ mu_s
    return R, t


def ate_rmse(est_poses, gt_poses, align: bool = True) -> float:
    """Absolute trajectory error RMSE between two lists of (4, 4)
    camera-to-world poses."""
    est = np.asarray([np.asarray(p)[:3, 3] for p in est_poses])
    gt = np.asarray([np.asarray(p)[:3, 3] for p in gt_poses])
    assert est.shape == gt.shape
    if align and len(est) >= 3:
        R, t = umeyama_alignment(est, gt)
        est = est @ R.T + t
    err = est - gt
    return float(np.sqrt(np.mean(np.sum(err * err, axis=-1))))


def rpe(est_poses, gt_poses, delta: int = 1):
    """Relative pose error over ``delta``-frame pairs: (translation RMSE
    in meters, rotation RMSE in degrees) — the TUM benchmark's drift
    metric pair."""
    terrs, rerrs = [], []
    for i in range(len(est_poses) - delta):
        e0, e1 = np.asarray(est_poses[i]), np.asarray(est_poses[i + delta])
        g0, g1 = np.asarray(gt_poses[i]), np.asarray(gt_poses[i + delta])
        rel_e = np.linalg.inv(e0) @ e1
        rel_g = np.linalg.inv(g0) @ g1
        d = np.linalg.inv(rel_g) @ rel_e
        terrs.append(np.sum(d[:3, 3] ** 2))
        cos = np.clip((np.trace(d[:3, :3]) - 1.0) / 2.0, -1.0, 1.0)
        rerrs.append(np.degrees(np.arccos(cos)) ** 2)
    if not terrs:
        return 0.0, 0.0
    return (
        float(np.sqrt(np.mean(terrs))),
        float(np.sqrt(np.mean(rerrs))),
    )


def rpe_rmse(est_poses, gt_poses, delta: int = 1) -> float:
    """Relative pose error (translation) RMSE over ``delta``-frame pairs."""
    return rpe(est_poses, gt_poses, delta)[0]
