"""Quality metrics for generated group choreography.

The reference repo ships NO evaluation code (SURVEY §4) although the paper
reports FID / beat-alignment on AIOZ-GDance; these are the standard
implementations of those metrics so the framework can reproduce the paper's
quality table:

  * kinetic motion features (Onuma et al.-style per-joint kinetic energy,
    the `FID_k` feature map used by AIST++/Bailando evaluation code)
  * boolean geometric features (Müller-2005 relational features on SMPL,
    the `FID_g` feature map of the same stack — eval/geometric.py)
  * Frechet Inception Distance over feature sets
  * diversity (mean pairwise feature distance)
  * beat-alignment score: exp(-d^2/2s^2) between music beats and kinematic
    beats (local minima of mean joint speed)
  * physical plausibility: foot-skating ratio and inter-dancer collision
    (trajectory-intersection) frequency for the group setting

All feature extraction is jit-able JAX over (dn, T, 24, 3) FK joint
positions at 30 FPS.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tcdiff_tpu.config import FOOT_JOINTS

FPS = 30


# ------------------------------------------------------------ feature maps
@jax.jit
def kinetic_features(joints: jnp.ndarray) -> jnp.ndarray:
    """(T, 24, 3) joint positions -> (72,) per-joint mean kinetic energy.

    E[j, axis] = mean_t 0.5 * v[t, j, axis]^2 with v in units/s."""
    vel = (joints[1:] - joints[:-1]) * FPS
    return (0.5 * jnp.mean(vel**2, axis=0)).reshape(-1)


def geometric_features(joints: jnp.ndarray) -> jnp.ndarray:
    """(T, 24, 3) -> (32,) boolean relational features (firing fractions) —
    the same feature FAMILY as AIST++/Bailando FID_g (eval/geometric.py,
    Müller-2005 relational features on the SMPL skeleton), replacing the
    round-2 height-statistics stand-in. Caveat (ADVICE r3): thresholds are
    re-derived from this repo's rest pose, not transcribed from
    google/aistplusplus_api, so ABSOLUTE FID_g values are not guaranteed to
    match published tables — relative comparisons under a fixed feature map
    are the supported use."""
    from tcdiff_tpu.eval.geometric import boolean_geometric_features

    return boolean_geometric_features(joints)


def extract_features(joints_batch, kind: str = "kinetic") -> np.ndarray:
    """(N, T, 24, 3) or (N, dn, T, 24, 3) -> (N*, D) feature matrix."""
    arr = jnp.asarray(joints_batch)
    if arr.ndim == 5:
        arr = arr.reshape((-1,) + arr.shape[2:])
    fn = kinetic_features if kind == "kinetic" else geometric_features
    return np.asarray(jax.vmap(fn)(arr))


# ------------------------------------------------------------------- FID
def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """Frechet distance between Gaussian fits of two feature sets.

    Standard TTUR/pytorch-fid recipe: sqrtm(S1 @ S2) with the eps ridge
    added ONLY if the plain product is singular — adding it unconditionally
    biases FID(X, X) away from 0. Cross-checked against the 1-D closed form
    and an independent eigh-based implementation in
    tests/test_metrics_golden.py."""
    from scipy import linalg

    mu1, mu2 = feats_a.mean(0), feats_b.mean(0)
    s1 = np.atleast_2d(np.cov(feats_a, rowvar=False))
    s2 = np.atleast_2d(np.cov(feats_b, rowvar=False))
    diff = mu1 - mu2
    covmean = linalg.sqrtm(s1 @ s2)
    if not np.isfinite(covmean).all():
        eps = 1e-6 * np.eye(s1.shape[0])
        covmean = linalg.sqrtm((s1 + eps) @ (s2 + eps))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(s1 + s2 - 2.0 * covmean))


def diversity(feats: np.ndarray, max_pairs: int = 10_000, seed: int = 0) -> float:
    """Mean pairwise euclidean distance in feature space."""
    n = len(feats)
    if n < 2:
        return 0.0
    rng = np.random.default_rng(seed)
    i = rng.integers(0, n, size=min(max_pairs, n * (n - 1)))
    j = rng.integers(0, n, size=len(i))
    keep = i != j
    return float(np.linalg.norm(feats[i[keep]] - feats[j[keep]], axis=1).mean())


# --------------------------------------------------------- beat alignment
def kinematic_beats(joints: np.ndarray, fps: int = FPS) -> np.ndarray:
    """Frame indices of kinematic beats: local minima of mean joint speed."""
    arr = np.asarray(joints)
    vel = np.linalg.norm(np.diff(arr, axis=0), axis=-1).mean(axis=-1) * fps  # (T-1,)
    minima = (vel[1:-1] < vel[:-2]) & (vel[1:-1] <= vel[2:])
    return np.where(minima)[0] + 1


def beat_alignment_score(
    joints: np.ndarray, music_beat_frames: np.ndarray, sigma: float = 3.0,
) -> float:
    """mean_b exp(-min_k (t_b - t_k)^2 / (2 sigma^2)) over MUSIC beats b and
    kinematic beats k (frame units @ 30 FPS) — the AIST++ BeatAlign score."""
    music = np.asarray(music_beat_frames, dtype=np.float64)
    kin = kinematic_beats(joints).astype(np.float64)
    if len(music) == 0 or len(kin) == 0:
        return 0.0
    d = np.abs(music[:, None] - kin[None, :]).min(axis=1)
    return float(np.mean(np.exp(-(d**2) / (2 * sigma**2))))


def music_beats_from_features(music_feats: np.ndarray, motion_fps: int = FPS) -> np.ndarray:
    """Motion-frame indices of beats from the 438-d features' one-hot beat
    channel (index 53; music runs at 2x motion FPS)."""
    beat_channel = np.asarray(music_feats)[:, 53]
    music_frames = np.where(beat_channel > 0.5)[0]
    return music_frames // 2


# -------------------------------------------------- physical plausibility
@jax.jit
def foot_skating_ratio(
    joints: jnp.ndarray, height_thresh: float = 0.05, vel_thresh: float = 0.075
) -> jnp.ndarray:
    """Fraction of foot-grounded frames where the foot still slides.

    A foot is grounded when within height_thresh of its own minimum height;
    skating when its horizontal speed exceeds vel_thresh units/frame-at-30fps
    while grounded."""
    feet = joints[:, FOOT_JOINTS, :]  # (T, 4, 3)
    z = feet[..., 2]
    grounded = z[:-1] < (jnp.min(z, axis=0, keepdims=True) + height_thresh)
    vel = jnp.linalg.norm(feet[1:, :, :2] - feet[:-1, :, :2], axis=-1) * FPS
    skating = grounded & (vel > vel_thresh)
    return jnp.sum(skating) / jnp.maximum(jnp.sum(grounded), 1)


@jax.jit
def collision_frequency(root_pos: jnp.ndarray, radius: float = 0.4) -> jnp.ndarray:
    """(dn, T, >=2) root positions -> fraction of frames where any two
    dancers are closer than `radius` in XY — the group-dance trajectory
    intersection metric."""
    xy = root_pos[..., :2]
    d = jnp.linalg.norm(xy[:, None] - xy[None, :], axis=-1)  # (dn, dn, T)
    dn = xy.shape[0]
    mask = ~jnp.eye(dn, dtype=bool)
    close = (d < radius) & mask[:, :, None]
    return jnp.mean(jnp.any(close, axis=(0, 1)).astype(jnp.float32))


def group_motion_consistency(joints_group: np.ndarray) -> float:
    """Mean pairwise cosine similarity of the dancers' kinetic feature
    vectors within one group — high when dancers move in a coordinated way
    (the GMC axis of group-dance evaluation). joints_group: (dn, T, 24, 3)."""
    feats = extract_features(np.asarray(joints_group)[None], "kinetic")  # (dn, 72) via reshape
    feats = feats.reshape(joints_group.shape[0], -1)
    dn = feats.shape[0]
    if dn < 2:
        return 1.0
    norms = np.linalg.norm(feats, axis=1, keepdims=True)
    unit = feats / np.maximum(norms, 1e-10)
    sim = unit @ unit.T
    mask = ~np.eye(dn, dtype=bool)
    return float(sim[mask].mean())


# ----------------------------------------------------------------- report
def evaluate(
    gen_joints: np.ndarray,
    ref_joints: np.ndarray,
    music_feats=None,
    gen_roots=None,
) -> dict:
    """Full metric report.

    gen/ref_joints: (N, dn, T, 24, 3) FK positions; music_feats: list/array
    of (F, 438) per sample; gen_roots: (N, dn, T, 3) for collisions.
    """
    fk_gen = extract_features(gen_joints, "kinetic")
    fk_ref = extract_features(ref_joints, "kinetic")
    fg_gen = extract_features(gen_joints, "geometric")
    fg_ref = extract_features(ref_joints, "geometric")
    out = {
        "fid_k": frechet_distance(fk_gen, fk_ref),
        "fid_g": frechet_distance(fg_gen, fg_ref),
        "div_k": diversity(fk_gen),
        "div_g": diversity(fg_gen),
        "foot_skate": float(
            np.mean([
                float(foot_skating_ratio(jnp.asarray(s)))
                for sample in np.asarray(gen_joints)
                for s in sample
            ])
        ),
    }
    if music_feats is not None:
        scores = []
        for sample, mf in zip(np.asarray(gen_joints), music_feats):
            beats = music_beats_from_features(mf)
            scores.append(
                np.mean([beat_alignment_score(d, beats) for d in sample])
            )
        out["beat_align"] = float(np.mean(scores))
    if gen_roots is not None:
        out["collision_freq"] = float(
            np.mean([float(collision_frequency(jnp.asarray(r))) for r in gen_roots])
        )
    out["gmc"] = float(
        np.mean([group_motion_consistency(g) for g in np.asarray(gen_joints)])
    )
    return out
