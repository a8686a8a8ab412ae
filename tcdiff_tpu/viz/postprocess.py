"""Sample postprocessing: unnormalize, FK, long-form stitching, render, export.

Rebuilds the back half of the reference's `GaussianDiffusion.render_sample`
(`/root/reference/model/diffusion.py:765-988`): split contacts, 6D -> rotation,
SMPL forward kinematics, the long-mode half-window crossfade of root
positions + quaternion slerp of joint rotations
(`model/diffusion.py:849-897`), matplotlib rendering, and the pkl FK dump the
Blender pipeline consumes (`model/diffusion.py:930-940,971-988`).

The geometry (FK, slerp, crossfade) runs in jitted JAX; only matplotlib and
pickle stay host-side.
"""

from __future__ import annotations

import os
import pickle
from pathlib import Path
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from tcdiff_tpu.data.normalizer import Normalizer
from tcdiff_tpu.geometry import (
    ax_from_6v,
    axis_angle_to_quaternion,
    quat_slerp,
    quaternion_to_axis_angle,
    smpl_fk,
)
from tcdiff_tpu.viz.render import skeleton_render


def split_sample(samples: jnp.ndarray, normalizer: Normalizer, dancer_num: int):
    """(b, seq*dn, 151) normalized -> (contacts, pos, q_axis_angle).

    contacts: (b, seq, dn, 4); pos: (b, seq*dn, 3); q: (b, seq*dn, 24, 3) —
    the reference's layout after `model/diffusion.py:811-838`.
    """
    b, tokens, c = samples.shape
    seq = tokens // dancer_num
    samples = normalizer.unnormalize(samples)
    s4 = samples.reshape(b, seq, dancer_num, c)
    contacts = s4[..., :4]
    rest = s4[..., 4:].reshape(b, tokens, c - 4)
    pos = rest[..., :3]
    q6 = rest[..., 3:].reshape(b, tokens, 24, 6)
    q = ax_from_6v(q6)
    return contacts, pos, q


@jax.jit
def _stitch_jax(pos, q):
    """Crossfade positions + slerp rotations across half-overlapping slices.

    pos: (b, s, dn, 3); q: (b, s, dn, 24, 3) axis-angle. Returns
    (L, dn, 3), (L, dn, 24, 3) with L = s + half*(b-1)
    (`model/diffusion.py:849-897`, vectorized over dancers).
    """
    b, s, dn = pos.shape[:3]
    half = s // 2

    fade_out = jnp.ones((s,))
    fade_out = fade_out.at[half:].set(jnp.linspace(1, 0, half))
    fade_in = jnp.ones((s,))
    fade_in = fade_in.at[:half].set(jnp.linspace(0, 1, half))

    faded = pos
    faded = faded.at[:-1].multiply(fade_out[None, :, None, None])
    faded = faded.at[1:].multiply(fade_in[None, :, None, None])

    L = s + half * (b - 1)
    full_pos = jnp.zeros((L, dn, 3))
    for i in range(b):  # b is static; unrolled overlap-add
        full_pos = jax.lax.dynamic_update_slice_in_dim(
            full_pos,
            jax.lax.dynamic_slice_in_dim(full_pos, i * half, s, axis=0) + faded[i],
            i * half,
            axis=0,
        )

    # rotations: slerp the overlap in quaternion space
    slerp_w = jnp.linspace(0, 1, half)[:, None, None, None]
    left = axis_angle_to_quaternion(q[:-1, half:])  # (b-1, half, dn, 24, 4)
    right = axis_angle_to_quaternion(q[1:, :half])
    merged = quaternion_to_axis_angle(quat_slerp(left, right, slerp_w[None, ..., 0]))

    parts = [q[0, :half]]
    for i in range(b - 1):
        parts.append(merged[i])
    parts.append(q[-1, half:])
    full_q = jnp.concatenate(parts, axis=0)  # (L, dn, 24, 3)
    return full_pos, full_q


def stitch_long(pos, q):
    """Host-friendly wrapper; accepts/returns numpy."""
    fp, fq = _stitch_jax(jnp.asarray(pos), jnp.asarray(q))
    return np.asarray(fp), np.asarray(fq)


def render_sample(
    samples,
    normalizer: Normalizer,
    epoch,
    render_out: str,
    dancer_num: int,
    fk_out: Optional[str] = None,
    name=None,
    sound: bool = True,
    mode: str = "normal",
    render: bool = True,
    render_len: int = 512,
):
    """Postprocess + render already-drawn samples.

    samples: (b, seq*dn, 151) normalized (any sampler's output). In "long"
    mode b is the slice count and the slices are stitched into one clip.
    """
    samples = jnp.asarray(samples)
    b = samples.shape[0]
    contacts, pos, q = split_sample(samples, normalizer, dancer_num)
    seq = samples.shape[1] // dancer_num

    if mode == "long":
        pos4 = pos.reshape(b, seq, dancer_num, 3)
        q4 = q.reshape(b, seq, dancer_num, 24, 3)
        full_pos, full_q = _stitch_jax(pos4, q4)  # (L, dn, ...)
        L = full_pos.shape[0]
        flat_pos = full_pos.reshape(1, L * dancer_num, 3)
        flat_q = full_q.reshape(1, L * dancer_num, 24, 3)
        full_pose = np.asarray(smpl_fk(flat_q, flat_pos)).reshape(L, dancer_num, 24, 3)
        full_pose = np.transpose(full_pose, (1, 0, 2, 3))  # (dn, L, 24, 3)

        if render:
            skeleton_render(
                full_pose[:, :render_len],
                epoch=f"{epoch}",
                out=render_out,
                name=name,
                sound=sound,
                stitch=True,
                render=render,
            )
        if fk_out is not None:
            Path(fk_out).mkdir(parents=True, exist_ok=True)
            base = "_".join(
                os.path.splitext(os.path.basename(name[0]))[0].split("_")[:-1]
            ) if name else "sample"
            outname = f"{epoch}_{base}.pkl"
            with open(os.path.join(fk_out, outname), "wb") as f:
                pickle.dump(
                    {
                        "smpl_poses": np.asarray(flat_q).reshape(-1, 72),
                        "smpl_trans": np.asarray(flat_pos).reshape(-1, 3),
                        "full_pose": full_pose,
                    },
                    f,
                )
        return full_pose

    poses = np.asarray(smpl_fk(q, pos))  # (b, seq*dn, 24, 3)
    poses = poses.reshape(b, seq, dancer_num, 24, 3).transpose(0, 2, 1, 3, 4)
    contacts_np = np.asarray(contacts).transpose(0, 2, 1, 3)  # (b, dn, seq, 4)

    if render:
        for num in range(b):
            filename = name[num] if name is not None else None
            skeleton_render(
                poses[num],
                epoch=f"e{epoch}_b{num}",
                out=render_out,
                name=filename,
                sound=sound,
                contact=contacts_np[num],
            )

    if fk_out is not None:
        Path(fk_out).mkdir(parents=True, exist_ok=True)
        q_np, pos_np = np.asarray(q), np.asarray(pos)
        for num in range(b):
            stem = (
                os.path.splitext(os.path.basename(name[num]))[0] if name else f"sample{num}"
            )
            with open(os.path.join(fk_out, f"{epoch}_{num}_{stem}.pkl"), "wb") as f:
                pickle.dump(
                    {
                        "smpl_poses": q_np[num].reshape(-1, 72),
                        "smpl_trans": pos_np[num],
                        "full_pose": poses[num],
                    },
                    f,
                )
    return poses
