"""Checkpointing round-trip, metric logging, and step timer."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tcdiff_tpu.data.normalizer import Normalizer
from tcdiff_tpu.optim import adan
from tcdiff_tpu.train import create_train_state
from tcdiff_tpu.utils import (
    MetricLogger,
    StepTimer,
    latest_checkpoint,
    restore_train_state,
    save_checkpoint,
)


def _tiny_state():
    params = {
        "dense": {"kernel": jnp.arange(6, dtype=jnp.float32).reshape(2, 3), "bias": jnp.ones((3,))}
    }
    tx = adan(1e-3)
    return create_train_state(params, tx), tx


def test_checkpoint_roundtrip(tmp_path):
    state, tx = _tiny_state()
    # advance the state so opt_state is non-trivial
    grads = jax.tree.map(jnp.ones_like, state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    import optax

    state = state.replace(
        step=state.step + 5,
        params=optax.apply_updates(state.params, updates),
        opt_state=opt_state,
    )
    norm = Normalizer.fit(jnp.linspace(-2, 2, 30).reshape(10, 3))

    path = save_checkpoint(str(tmp_path), 5, state, norm)
    assert latest_checkpoint(str(tmp_path)) == path

    fresh, _ = _tiny_state()
    restored, rnorm = restore_train_state(path, fresh)
    assert int(restored.step) == 5
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        state.params,
        restored.params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        state.opt_state,
        restored.opt_state,
    )
    x = jnp.array([[0.3, -0.1, 1.2]])
    np.testing.assert_allclose(
        np.asarray(norm.normalize(x)), np.asarray(rnorm.normalize(x)), rtol=1e-6
    )


def test_latest_checkpoint_ordering(tmp_path):
    state, _ = _tiny_state()
    save_checkpoint(str(tmp_path), 2, state)
    p10 = save_checkpoint(str(tmp_path), 10, state)
    assert latest_checkpoint(str(tmp_path)) == p10
    assert latest_checkpoint(str(tmp_path / "nope")) is None


def test_metric_logger_jsonl(tmp_path):
    ml = MetricLogger(str(tmp_path), config={"lr": 1e-3}, use_wandb=False, use_tensorboard=False)
    ml.log({"loss": jnp.float32(0.5), "name": "x"}, step=1)
    ml.log({"loss": 0.25}, step=2)
    ml.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0] == {"_config": {"lr": 1e-3}}
    assert lines[1]["loss"] == 0.5 and lines[1]["step"] == 1
    assert lines[2]["loss"] == 0.25


def test_step_timer():
    t = StepTimer()
    assert t.metrics() == {}
    t.tick()
    dt = t.tock()
    assert dt >= 0
    m = t.metrics(motion_seconds_per_step=10.0)
    assert m["steps_per_sec"] > 0 and m["motion_s_per_sec"] > 0
