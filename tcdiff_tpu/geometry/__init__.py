from tcdiff_tpu.geometry.rotations import (  # noqa: F401
    axis_angle_to_matrix,
    axis_angle_to_quaternion,
    ax_from_6v,
    ax_to_6v,
    matrix_to_axis_angle,
    matrix_to_quaternion,
    matrix_to_rotation_6d,
    quat_from_6v,
    quat_to_6v,
    quat_apply,
    quat_multiply,
    quat_slerp,
    quaternion_to_axis_angle,
    quaternion_to_matrix,
    rotation_6d_to_matrix,
)
from tcdiff_tpu.geometry.skeleton import (  # noqa: F401
    SMPL_JOINTS,
    SMPL_OFFSETS,
    SMPL_PARENTS,
    smpl_fk,
    smpl_fk_from_6d,
)
