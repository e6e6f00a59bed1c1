"""Checkpoint/resume subsystem (new capability — SURVEY §5.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ggp_tpu.utils.checkpoint import CheckpointManager, load_pytree, save_pytree


def _tree():
    return {"kernel": {"log_outputscale": jnp.asarray(0.3),
                       "base": {"log_lengthscale": jnp.arange(3.0)}},
            "Z": jnp.ones((4, 3)),
            "opt": [jnp.zeros(2), jnp.ones(2)]}


def test_roundtrip(tmp_path):
    t = _tree()
    p = save_pytree(str(tmp_path / "ck"), t, {"note": "hi"})
    restored, meta = load_pytree(p, jax.tree_util.tree_map(jnp.zeros_like, t))
    assert meta["note"] == "hi"
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(t)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shape_mismatch_rejected(tmp_path):
    t = _tree()
    p = save_pytree(str(tmp_path / "ck"), t)
    bad = _tree()
    bad["Z"] = jnp.ones((5, 3))
    with pytest.raises(ValueError, match="shape mismatch"):
        load_pytree(p, bad)


def test_manager_prunes_and_restores_latest(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpts"), max_to_keep=2)
    t = _tree()
    for step in (10, 20, 30):
        t["Z"] = jnp.full((4, 3), float(step))
        mgr.save(step, t, {"loss": step * 1.0})
    assert mgr.all_steps() == [20, 30]
    restored, meta = mgr.restore(jax.tree_util.tree_map(jnp.zeros_like, t))
    assert meta["step"] == 30
    np.testing.assert_array_equal(np.asarray(restored["Z"]),
                                  np.full((4, 3), 30.0))
    empty_mgr = CheckpointManager(str(tmp_path / "none"))
    assert empty_mgr.restore(t) == (None, None)


def test_resume_training_equivalence(tmp_path):
    """Training 100 steps == training 50, checkpointing, restoring, 50 more."""
    from ggp_tpu.models import SparseGPR
    from ggp_tpu.utils.load_data import DataConfig, load_1d_synthetic

    X, y, _ = load_1d_synthetic(data_cfg=DataConfig(n=40, noise=0.2), seed=2)
    a = SparseGPR(X, y, Z_init=X[::4])
    a.train_model(max_steps=100, lr=0.02, verbose=False)

    b = SparseGPR(X, y, Z_init=X[::4])
    b.train_model(max_steps=50, lr=0.02, verbose=False)
    p = save_pytree(str(tmp_path / "mid"), b.params)
    c = SparseGPR(X, y, Z_init=X[::4])
    c.params, _ = load_pytree(p, c.params)
    c.train_model(max_steps=50, lr=0.02, verbose=False)
    # not bit-identical (fresh Adam moments) but should land very close
    la = float(a.loss_fn(a.params))
    lc = float(c.loss_fn(c.params))
    assert abs(la - lc) / (abs(la) + 1e-9) < 0.2
