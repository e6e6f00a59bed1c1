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


def test_load_pytree_dict_no_template(tmp_path):
    """Template-free restore of nested-dict bundles whose leaf shapes a
    caller cannot know up front (trainer state with varying trace sizes)."""
    from ggp_tpu.utils.checkpoint import load_pytree_dict
    tree = {"hypers": {"kernel": {"base": {"log_lengthscale": jnp.ones(3)},
                                  "log_outputscale": jnp.asarray(0.5)}},
            "Z": jnp.zeros((4, 3)),
            "losses": jnp.arange(7.0)}
    p = save_pytree(str(tmp_path / "b"), tree, {"next_round": 2})
    out, meta = load_pytree_dict(p)
    assert meta["next_round"] == 2
    np.testing.assert_array_equal(
        out["hypers"]["kernel"]["base"]["log_lengthscale"], np.ones(3))
    assert out["losses"].shape == (7,)
    assert load_pytree_dict(str(tmp_path / "missing")) == (None, None)


@pytest.mark.slow
def test_flagship_kill_and_resume_matches_uninterrupted(tmp_path):
    """VERDICT r4 item 4: the alternating trainer checkpoints per HMC
    round; a run killed mid-schedule and resumed with resume=True reaches
    the SAME final state as an uninterrupted run (same key stream, same
    round schedule)."""
    from ggp_tpu.models import BayesianSparseGPR_HMC
    from ggp_tpu.utils.load_data import DataConfig, load_1d_synthetic

    X, y, _ = load_1d_synthetic(data_cfg=DataConfig(n=48, noise=0.2), seed=4)
    Z0 = X[::6]
    kw = dict(max_steps=30, hmc_scheduler=[10, 20, 30], lr=0.02,
              key=jax.random.PRNGKey(7))

    ref = BayesianSparseGPR_HMC(X, y, Z_init=Z0)
    losses_ref = ref.train_model(**kw)

    ckdir = str(tmp_path / "ck")

    class _Kill(RuntimeError):
        pass

    victim = BayesianSparseGPR_HMC(X, y, Z_init=Z0)
    orig = victim.optimize_Z
    calls = {"n": 0}

    def dying_optimize_Z(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:           # die mid-round-2, after its HMC
            raise _Kill()
        return orig(*a, **k)

    victim.optimize_Z = dying_optimize_Z
    with pytest.raises(_Kill):
        victim.train_model(checkpoint_dir=ckdir, **kw)

    resumed = BayesianSparseGPR_HMC(X, y, Z_init=Z0)
    losses_res = resumed.train_model(checkpoint_dir=ckdir, resume=True, **kw)

    np.testing.assert_allclose(np.asarray(resumed.Z), np.asarray(ref.Z),
                               rtol=1e-6, atol=1e-6)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(resumed.hypers),
            jax.tree_util.tree_leaves_with_path(ref.hypers)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=str(pa))
    np.testing.assert_allclose(np.asarray(losses_res),
                               np.asarray(losses_ref), rtol=1e-5, atol=1e-5)
    # schedule mismatch refuses to resume
    other = BayesianSparseGPR_HMC(X, y, Z_init=Z0)
    with pytest.raises(ValueError, match="different schedule"):
        other.train_model(checkpoint_dir=ckdir, resume=True, max_steps=40,
                          hmc_scheduler=[10, 20, 40], lr=0.02,
                          key=jax.random.PRNGKey(7))
