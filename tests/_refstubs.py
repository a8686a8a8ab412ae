"""Test fixture: stand-in modules so the PyTorch reference imports cleanly.

The reference depends on pytorch3d, librosa, soundfile, p_tqdm, and wandb —
none of which exist in this image. For golden-parity tests we install
lightweight substitutes into sys.modules BEFORE importing reference modules:

  * `pytorch3d.transforms` — our own torch implementations of the standard
    rotation conversions with pytorch3d's conventions (wxyz real-first
    quaternions, row-stacked 6D). These are independent reimplementations
    of textbook formulas, used only as a test harness.
  * `librosa` / `soundfile` / `p_tqdm` / `wandb` — inert shims; the code
    paths we golden-test never call them (rendering/audio are host-side).

Call `install()` once, then `sys.path.insert(0, "/root/reference")` imports
work.
"""

from __future__ import annotations

import sys
import types

import numpy as np


def _build_transforms(torch):
    m = types.ModuleType("pytorch3d.transforms")

    def axis_angle_to_quaternion(axis_angle):
        angles = torch.norm(axis_angle, p=2, dim=-1, keepdim=True)
        half = angles * 0.5
        eps = 1e-6
        small = angles.abs() < eps
        sin_half_over = torch.empty_like(angles)
        sin_half_over[~small] = torch.sin(half[~small]) / angles[~small]
        sin_half_over[small] = 0.5 - (angles[small] * angles[small]) / 48
        return torch.cat([torch.cos(half), axis_angle * sin_half_over], dim=-1)

    def quaternion_to_axis_angle(q):
        norms = torch.norm(q[..., 1:], p=2, dim=-1, keepdim=True)
        half_angles = torch.atan2(norms, q[..., :1])
        angles = 2 * half_angles
        eps = 1e-6
        small = angles.abs() < eps
        sin_half_over = torch.empty_like(angles)
        sin_half_over[~small] = torch.sin(half_angles[~small]) / angles[~small]
        sin_half_over[small] = 0.5 - (angles[small] * angles[small]) / 48
        return q[..., 1:] / sin_half_over

    def standardize_quaternion(q):
        return torch.where(q[..., 0:1] < 0, -q, q)

    def quaternion_raw_multiply(a, b):
        aw, ax, ay, az = torch.unbind(a, -1)
        bw, bx, by, bz = torch.unbind(b, -1)
        return torch.stack(
            [
                aw * bw - ax * bx - ay * by - az * bz,
                aw * bx + ax * bw + ay * bz - az * by,
                aw * by - ax * bz + ay * bw + az * bx,
                aw * bz + ax * by - ay * bx + az * bw,
            ],
            -1,
        )

    def quaternion_multiply(a, b):
        return standardize_quaternion(quaternion_raw_multiply(a, b))

    def quaternion_invert(q):
        return q * torch.tensor([1, -1, -1, -1], dtype=q.dtype, device=q.device)

    def quaternion_apply(q, point):
        real = torch.zeros(point.shape[:-1] + (1,), dtype=point.dtype, device=point.device)
        p4 = torch.cat([real, point], dim=-1)
        out = quaternion_raw_multiply(quaternion_raw_multiply(q, p4), quaternion_invert(q))
        return out[..., 1:]

    def quaternion_to_matrix(q):
        w, x, y, z = torch.unbind(q, -1)
        two_s = 2.0 / (q * q).sum(-1)
        o = torch.stack(
            [
                1 - two_s * (y * y + z * z),
                two_s * (x * y - z * w),
                two_s * (x * z + y * w),
                two_s * (x * y + z * w),
                1 - two_s * (x * x + z * z),
                two_s * (y * z - x * w),
                two_s * (x * z - y * w),
                two_s * (y * z + x * w),
                1 - two_s * (x * x + y * y),
            ],
            -1,
        )
        return o.reshape(q.shape[:-1] + (3, 3))

    def _sqrt_positive_part(x):
        ret = torch.zeros_like(x)
        pos = x > 0
        ret[pos] = torch.sqrt(x[pos])
        return ret

    def matrix_to_quaternion(matrix):
        batch_dim = matrix.shape[:-2]
        m00, m01, m02, m10, m11, m12, m20, m21, m22 = torch.unbind(
            matrix.reshape(batch_dim + (9,)), -1
        )
        q_abs = _sqrt_positive_part(
            torch.stack(
                [
                    1.0 + m00 + m11 + m22,
                    1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22,
                    1.0 - m00 - m11 + m22,
                ],
                -1,
            )
        )
        quat_by_rijk = torch.stack(
            [
                torch.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1),
                torch.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], -1),
                torch.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], -1),
                torch.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], -1),
            ],
            -2,
        )
        flr = torch.tensor(0.1, dtype=q_abs.dtype, device=q_abs.device)
        quat_candidates = quat_by_rijk / (2.0 * q_abs[..., None].max(flr))
        idx = q_abs.argmax(dim=-1)
        one_hot = torch.nn.functional.one_hot(idx, num_classes=4).to(matrix.dtype)
        out = (quat_candidates * one_hot[..., None]).sum(-2)
        return out / torch.norm(out, dim=-1, keepdim=True)

    def axis_angle_to_matrix(aa):
        return quaternion_to_matrix(axis_angle_to_quaternion(aa))

    def matrix_to_axis_angle(matrix):
        return quaternion_to_axis_angle(matrix_to_quaternion(matrix))

    def rotation_6d_to_matrix(d6):
        a1, a2 = d6[..., :3], d6[..., 3:]
        b1 = torch.nn.functional.normalize(a1, dim=-1)
        b2 = a2 - (b1 * a2).sum(-1, keepdim=True) * b1
        b2 = torch.nn.functional.normalize(b2, dim=-1)
        b3 = torch.cross(b1, b2, dim=-1)
        return torch.stack((b1, b2, b3), dim=-2)

    def matrix_to_rotation_6d(matrix):
        return matrix[..., :2, :].clone().reshape(matrix.shape[:-2] + (6,))

    class RotateAxisAngle:
        """Minimal stand-in for pytorch3d.transforms.RotateAxisAngle —
        only what `dataset/group_dataset.py` uses (transform_points)."""

        def __init__(self, angle, axis="X", degrees=True):
            ang = float(angle) * np.pi / 180.0 if degrees else float(angle)
            axis_vec = {"X": [1, 0, 0], "Y": [0, 1, 0], "Z": [0, 0, 1]}[axis]
            self._q = axis_angle_to_quaternion(torch.tensor(axis_vec, dtype=torch.float32) * ang)

        def transform_points(self, points):
            return quaternion_apply(self._q.to(points.dtype), points)

    for name, fn in locals().items():
        if name not in ("m", "torch"):
            setattr(m, name, fn)
    return m


def install():
    if "pytorch3d" in sys.modules:
        return
    import torch

    pkg = types.ModuleType("pytorch3d")
    tfm = _build_transforms(torch)
    pkg.transforms = tfm
    sys.modules["pytorch3d"] = pkg
    sys.modules["pytorch3d.transforms"] = tfm

    for name in ("librosa", "soundfile", "wandb"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)

    if "p_tqdm" not in sys.modules:
        p_tqdm = types.ModuleType("p_tqdm")
        p_tqdm.p_map = lambda fn, it, **kw: list(map(fn, it))
        sys.modules["p_tqdm"] = p_tqdm

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
