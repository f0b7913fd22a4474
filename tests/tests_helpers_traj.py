"""Shared trajectory helper for PGO tests."""
import numpy as np

from rslo_tpu import geometry as G


def make_traj(n=60):
    odoms = np.zeros((n, 7), np.float32)
    odoms[:, 3] = 1.0
    odoms[1:, 0] = 1.0
    odoms[1:, 6] = 0.01
    odoms[1:, 3] = np.sqrt(1 - 0.01 ** 2)
    return G.odom_to_abs_pose(odoms)
