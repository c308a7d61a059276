"""Checkpoint/resume and profiling-hook tests."""

import numpy as np

from riskaversetrajopt_tpu.utils import checkpoint as ckpt


def test_checkpoint_roundtrip(tmp_path):
    p = tmp_path / "scp_state.npz"
    us = np.random.default_rng(0).standard_normal((20, 3))
    wx = np.random.default_rng(1).standard_normal(112)
    wy = np.random.default_rng(2).standard_normal(500)
    ckpt.save(p, 7, us, wx, wy)
    loaded = ckpt.load(p)
    assert loaded.scp_iter == 7
    np.testing.assert_array_equal(loaded.us, us)
    np.testing.assert_array_equal(loaded.warm_x, wx)
    np.testing.assert_array_equal(loaded.warm_y, wy)
    assert ckpt.load(tmp_path / "missing.npz") is None


def test_scp_resume_matches_uninterrupted(tmp_path):
    """An interrupted-and-resumed instrumented solve reaches the same final
    controls as an uninterrupted run."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from riskaversetrajopt_tpu.core.config import DroneScenario
    from riskaversetrajopt_tpu.models.drone import DroneModel
    from riskaversetrajopt_tpu.scp.driver import SAATrajOpt

    model = DroneModel(DroneScenario())
    scp_cfg = dataclasses.replace(model.default_scp_config(), num_iters=8)
    opt = SAATrajOpt(model, method="saa", scp_cfg=scp_cfg)
    omegas = opt.sample(jax.random.PRNGKey(0), M=6)

    full = opt.solve_instrumented(omegas, 0.2)

    # run 4 iterations with checkpointing, then resume to completion
    p = str(tmp_path / "state.npz")
    scp4 = dataclasses.replace(model.default_scp_config(), num_iters=4)
    opt4 = SAATrajOpt(model, method="saa", scp_cfg=scp4)
    opt4.solve_instrumented(omegas, 0.2, checkpoint_path=p)
    resumed = opt.solve_instrumented(omegas, 0.2, checkpoint_path=p)

    np.testing.assert_allclose(
        np.asarray(resumed["us"]), np.asarray(full["us"]), rtol=1e-6, atol=1e-9
    )


def test_fused_solve_resume_matches_uninterrupted(tmp_path):
    """Checkpoint/resume on the FUSED production path (driver.solve with
    an ordered io_callback inside the SCP lax.scan): a solve killed after
    4 of 8 iterations, resumed from its on-disk snapshot, reaches the same
    final controls as the uninterrupted run."""
    import dataclasses

    import jax

    from riskaversetrajopt_tpu.core.config import DroneScenario
    from riskaversetrajopt_tpu.models.drone import DroneModel
    from riskaversetrajopt_tpu.scp.driver import SAATrajOpt

    model = DroneModel(DroneScenario())
    scp_cfg = dataclasses.replace(model.default_scp_config(), num_iters=8)
    opt = SAATrajOpt(model, method="saa", scp_cfg=scp_cfg)
    omegas = opt.sample(jax.random.PRNGKey(0), M=6)

    full = opt.solve(omegas, 0.2)

    # "kill" after 4 iterations: a 4-iteration solve leaves its last
    # snapshot on disk; the 8-iteration solve then resumes from it
    p = str(tmp_path / "fused_state.npz")
    scp4 = dataclasses.replace(model.default_scp_config(), num_iters=4)
    opt4 = SAATrajOpt(model, method="saa", scp_cfg=scp4)
    opt4.solve(omegas, 0.2, checkpoint_path=p)
    assert ckpt.load(p).scp_iter == 4
    assert ckpt.load(p).warm_rho is not None

    resumed = opt.solve(omegas, 0.2, checkpoint_path=p)
    # per-iteration stats cover only the remaining iterations
    assert resumed.us_history.shape[0] == 4
    np.testing.assert_allclose(
        np.asarray(resumed.us), np.asarray(full.us), rtol=1e-6, atol=1e-9
    )
    # the resumed run advanced the snapshot to completion
    assert ckpt.load(p).scp_iter == 8


def test_profiling_annotate_smoke():
    from riskaversetrajopt_tpu.utils.profiling import annotate

    with annotate("unit-test-span"):
        pass
