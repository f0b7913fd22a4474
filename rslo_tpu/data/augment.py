"""Host-side training augmentations.

Ports the reference's per-sample augmentations
(/root/reference/rslo/data/preprocess.py:230-245, 335-458): random y-flip
of points/normals + mirrored odometry (R' = F R F, t' = F t with
F = diag(1,-1,1)), and pose-interpolation augmentation (slerp between
window poses by a random ratio).
"""
from __future__ import annotations

import numpy as np

from ..geometry import matrix_to_quat_np, quat_to_matrix_np

FLIP = np.diag([1.0, -1.0, 1.0])


def flip_odometry(odom: np.ndarray) -> np.ndarray:
    """Mirror one (7,) pose across the xz-plane."""
    R = quat_to_matrix_np(odom[3:])
    Rn = FLIP @ R @ FLIP.T
    q = matrix_to_quat_np(Rn)
    if q[0] != 0:
        q = q * np.sign(q[0])
    return np.concatenate([FLIP @ odom[:3], q]).astype(np.float32)


def random_flip_y(sample: dict, rng: np.random.Generator) -> dict:
    """Flip point y + normal y in every frame and mirror all pair
    odometries.  Mutates and returns the sample."""
    if rng.random() <= 0.5:
        return sample
    for pts in sample["points"]:
        pts[:, 1] = -pts[:, 1]
        if pts.shape[1] >= 7:
            pts[:, 5] = -pts[:, 5]       # normal y (x,y,z,i,nx,ny,nz)
        elif pts.shape[1] >= 6:
            pts[:, 4] = -pts[:, 4]       # (x,y,z,nx,ny,nz)
    odom = sample["odometry"]
    for k in range(len(odom)):
        odom[k] = flip_odometry(odom[k])
    return sample


def pose_interp_aug(sample: dict, rng: np.random.Generator,
                    ratio: float) -> dict:
    """Perturb window poses by slerping toward neighbors (the reference's
    rand_aug_ratio path, preprocess.py:389-458) — approximated by scaling
    each pair motion's translation and rotation by (1 + u), u ~ U(-r, r).
    Points are NOT warped (matching the reference, which perturbs only
    the supervision targets)."""
    if ratio <= 0:
        return sample
    from ..geometry.transforms import quat_to_matrix_np
    odom = sample["odometry"]
    for k in range(len(odom)):
        u = 1.0 + rng.uniform(-ratio, ratio)
        t = odom[k][:3] * u
        # scale rotation angle via axis-angle
        q = odom[k][3:]
        w = np.clip(q[0], -1, 1)
        ang = 2 * np.arccos(w)
        axis = q[1:]
        n = np.linalg.norm(axis)
        if n > 1e-9 and ang > 1e-9:
            axis = axis / n
            ang2 = ang * u
            q = np.concatenate([[np.cos(ang2 / 2)],
                                axis * np.sin(ang2 / 2)])
        odom[k] = np.concatenate([t, q]).astype(np.float32)
    return sample
