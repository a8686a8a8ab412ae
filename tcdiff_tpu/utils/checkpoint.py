"""Orbax checkpointing of the training state + normalizer, and .pt import.

The reference torch.saves `{"ema_state_dict", "model_state_dict",
"optimizer_state_dict", "normalizer"}` every 50 epochs
(`/root/reference/TCDiff.py:266-274`) and on load picks EMA weights for eval
or raw weights for train-resume, re-adding the DDP `module.` prefix when
world size > 1 (`TCDiff.py:31-36,113-120`). Here the whole `TrainState`
pytree (params, EMA shadow, Adan state, step) plus the normalizer stats ride
through orbax as one atomic directory per save — no prefix games, and unlike
the reference the optimizer state actually restores (the reference saves it
but never loads it, `TCDiff.py:113-120`).

`load_reference_checkpoint` imports a reference-trained `.pt` (gated on
torch being importable) via `tcdiff_tpu.interop.torch_convert`, enabling
bit-comparability runs on TPU with reference weights.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np
import jax

from tcdiff_tpu.data.normalizer import Normalizer


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def _to_numpy_tree(tree):
    return jax.tree.map(np.asarray, tree)


def save_checkpoint(directory: str, step: int, state, normalizer: Optional[Normalizer] = None) -> str:
    """Write `{directory}/ckpt_{step}` atomically. Returns the path.

    The state pytree goes through `flax.serialization.to_state_dict` first so
    optax NamedTuple states become plain string-keyed dicts — restorable
    without knowing the exact container types.
    """
    from flax import serialization

    path = Path(directory).absolute() / f"ckpt_{step}"
    payload = {"state": _to_numpy_tree(serialization.to_state_dict(state))}
    if normalizer is not None:
        payload["normalizer"] = normalizer.to_numpy()
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return str(path)


def latest_checkpoint(directory: str) -> Optional[str]:
    d = Path(directory)
    if not d.is_dir():
        return None
    steps = []
    for p in d.iterdir():
        if p.is_dir() and p.name.startswith("ckpt_"):
            try:
                steps.append((int(p.name.split("_")[1]), p))
            except ValueError:
                continue
    if not steps:
        return None
    return str(max(steps)[1])


def load_checkpoint(path: str, target=None) -> dict:
    """Restore the payload dict written by `save_checkpoint`.

    Without `target`, nested containers come back as plain dicts (fine for
    inspection); pass a matching payload tree to preserve exact structure
    (e.g. optax NamedTuple states).
    """
    ckptr = _checkpointer()
    if target is None:
        restored = ckptr.restore(Path(path).absolute())
    else:
        restored = ckptr.restore(Path(path).absolute(), target)
    if "normalizer" in restored:
        n = restored["normalizer"]
        restored["normalizer"] = Normalizer.from_torch_state(n["scale"], n["offset"])
    return restored


def restore_train_state(path: str, state):
    """Load a checkpoint into an existing TrainState (shapes must match).

    Returns (state, normalizer | None). Restores params, EMA, optimizer
    state, and the step counter — full train resume, unlike the reference
    which drops optimizer state on resume (`TCDiff.py:113-120`).
    """
    from flax import serialization

    restored = load_checkpoint(path)
    new_state = serialization.from_state_dict(state, restored["state"])
    return new_state, restored.get("normalizer")


def load_reference_checkpoint(pt_path: str, num_layers: int = 8, use_ema: bool = True):
    """Import a reference torch checkpoint (`TCDiff.py:266-274` format).

    Returns (flax params for DanceDecoder, Normalizer). Requires torch.
    """
    import torch  # baked into the image (CPU build)

    from tcdiff_tpu.interop.torch_convert import dance_decoder_params_from_torch

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    key = "ema_state_dict" if use_ema else "model_state_dict"
    sd = {
        k.replace("module.", ""): v.numpy()
        for k, v in ckpt[key].items()
    }
    params = dance_decoder_params_from_torch(sd, num_layers=num_layers)
    norm_obj = ckpt.get("normalizer")
    normalizer = None
    if norm_obj is not None:
        normalizer = Normalizer.from_torch_state(
            np.asarray(norm_obj.scaler.scale_), np.asarray(norm_obj.scaler.min_)
        )
    return params, normalizer
