from tcdiff_tpu.eval.metrics import (
    beat_alignment_score,
    collision_frequency,
    diversity,
    evaluate,
    extract_features,
    foot_skating_ratio,
    frechet_distance,
    geometric_features,
    group_motion_consistency,
    kinematic_beats,
    kinetic_features,
    music_beats_from_features,
)

__all__ = [
    "beat_alignment_score",
    "collision_frequency",
    "diversity",
    "evaluate",
    "extract_features",
    "foot_skating_ratio",
    "frechet_distance",
    "geometric_features",
    "group_motion_consistency",
    "kinematic_beats",
    "kinetic_features",
    "music_beats_from_features",
]
