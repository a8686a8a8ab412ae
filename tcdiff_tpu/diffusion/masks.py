"""Channel/frame masks for inpainting-style sampling.

Rebuilds `/root/reference/TrajDecoder/dataset/masks.py:31-86` (unused in the
reference but paired with its `inpaint_loop` samplers; here they plug into
`GaussianDiffusion.p_sample_loop(..., constraint=...)`-style conditioning).
Masks are pure functions of a (…, seq, channels) shape — 1 where the input
is KEPT, 0 where the model fills in.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

LOWERBODY_JOINTS = (0, 1, 2, 4, 5, 7, 8, 10, 11)
UPPERBODY_JOINTS = (0, 3, 6, 9, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23)


def joint_indices_to_channel_indices(indices: Sequence[int]) -> list:
    """Joint ids -> rot6d channel ids in the 151-d layout.

    The reference maps into its (3 + 3*j) axis-angle layout
    (`masks.py:31-35`); our packed motion uses
    [contacts(4), root(3), rot6d(24*6)], so joint j spans 7+6j .. 7+6j+6.
    """
    out = []
    for j in indices:
        out += list(range(7 + 6 * j, 7 + 6 * j + 6))
    return out


def first_last_mask(shape, start_width: int = 1, end_width: int = 1) -> jnp.ndarray:
    mask = jnp.zeros(shape)
    mask = mask.at[..., :start_width, :].set(1.0)
    return mask.at[..., -end_width:, :].set(1.0)


def first_mask(shape, start_width: int = 1) -> jnp.ndarray:
    return jnp.zeros(shape).at[..., :start_width, :].set(1.0)


def middle_mask(shape, start: int = 0, end: int = -1) -> jnp.ndarray:
    return jnp.zeros(shape).at[..., start:end, :].set(1.0)


def _body_mask(shape, joints: Sequence[int], include_root: bool) -> jnp.ndarray:
    chans = joint_indices_to_channel_indices(joints)
    if include_root:
        chans = chans + [4, 5, 6]  # root position channels
    mask = jnp.zeros(shape)
    return mask.at[..., :, jnp.asarray(chans)].set(1.0)


def lowerbody_mask(shape) -> jnp.ndarray:
    """Keep legs + root trajectory (`masks.py:62-73`)."""
    return _body_mask(shape, LOWERBODY_JOINTS, include_root=True)


def upperbody_mask(shape) -> jnp.ndarray:
    """Keep torso/arms + root trajectory (`masks.py:76-86`)."""
    return _body_mask(shape, UPPERBODY_JOINTS, include_root=True)
