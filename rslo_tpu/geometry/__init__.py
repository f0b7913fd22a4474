from .quaternion import (qnormalize, hemisphere, qmult, qinv, qexp, qlog,
                         rotate_vec_by_q, compose_pose, invert_pose, calc_vo,
                         transform_points, quat_to_matrix, matrix_to_quat,
                         slerp)
from .tq_map import grid_cell_coords, generate_tq_map, decode_tq_map
from .kabsch import weighted_kabsch
from .transforms import (RT_to_tq, tq_to_RT, cam_pose_to_lidar,
                         odom_to_abs_pose, np_compose_pose, np_invert_pose,
                         np_calc_vo, expand_rigid, matrix_to_quat_np,
                         quat_to_matrix_np, umeyama_alignment, ate_rmse)

__all__ = [
    "qnormalize", "hemisphere", "qmult", "qinv", "qexp", "qlog",
    "rotate_vec_by_q", "compose_pose", "invert_pose", "calc_vo",
    "transform_points", "quat_to_matrix", "matrix_to_quat", "slerp",
    "grid_cell_coords", "generate_tq_map", "decode_tq_map",
    "weighted_kabsch",
    "RT_to_tq", "tq_to_RT", "cam_pose_to_lidar", "odom_to_abs_pose",
    "np_compose_pose", "np_invert_pose", "np_calc_vo", "expand_rigid",
    "matrix_to_quat_np", "quat_to_matrix_np", "umeyama_alignment",
    "ate_rmse",
]
