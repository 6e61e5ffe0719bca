"""End-to-end smoke tests on a tiny synthetic video dataset (CPU).

These drive the full slices: eval harness, DM distillation, buffer
generation, and MTT distillation, at miniature shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_distillation_tpu.config import BufferConfig
from video_distillation_tpu.data import make_synthetic_video_data
from video_distillation_tpu.distill import (DMState, EvalConfig,
                                            ExpertSampler, TrajectoryBuffer,
                                            evaluate_synset,
                                            init_synthetic_raw,
                                            make_batch_plan, make_dm_trainer,
                                            train_expert)
from video_distillation_tpu.distill.buffer import generate_buffers
from video_distillation_tpu.distill.mtt import _build_mtt_step


@pytest.fixture(scope="module")
def tiny_data():
    return make_synthetic_video_data(num_classes=3, clips_per_class=6,
                                     test_per_class=4, frames=8,
                                     im_size=(64, 64), seed=0,
                                     name="tiny-e2e")


def test_evaluate_synset_learns_separable_classes(tiny_data):
    """Real-initialised synthetic data on a linearly separable toy set must
    reach well-above-chance test accuracy."""
    syn, labels = init_synthetic_raw(jax.random.PRNGKey(0), tiny_data.train,
                                     ipc=2, frames=8, init="real")
    # lr 0.003: the reference default 0.01 diverges on this 18-sample toy
    cfg = EvalConfig(model="ConvNet3D", epoch_eval_train=40, lr_net=0.003,
                     batch_train=32)
    res = evaluate_synset(jax.random.PRNGKey(1), syn, labels, tiny_data,
                          cfg, np.random.default_rng(0))
    assert 0.0 <= res.acc_train <= 1.0
    assert res.acc_test > 0.5  # chance = 1/3
    assert res.acc_per_class.shape == (3,)


def test_dm_step_decreases_loss(tiny_data):
    syn, labels = init_synthetic_raw(jax.random.PRNGKey(0), tiny_data.train,
                                     ipc=1, frames=8, init="noise")
    trainer = make_dm_trainer(tiny_data.train, "ConvNet3D", ipc=1,
                              batch_real=4, lr_img=1.0, frames=8)
    state = DMState(syn, labels, jnp.zeros_like(syn))
    rng = np.random.default_rng(0)
    # per-iteration losses are dominated by fresh-random-net variance
    # (each DM step embeds with a new net — distill_baseline.py:334), so
    # compare the loss under the SAME probe net before vs after training
    probe = jax.random.PRNGKey(7)

    def probe_loss(st):  # the trainer donates its buffers: probe a copy
        st = DMState(jnp.array(st.syn_images, copy=True), st.labels,
                     jnp.array(st.momentum, copy=True))
        return float(trainer(probe, st, np.random.default_rng(1))[1])

    loss_before = probe_loss(state)
    for it in range(20):
        state, _ = trainer(jax.random.PRNGKey(100 + it), state, rng)
    loss_after = probe_loss(state)
    # noise-initialised syn moved toward the real feature means
    assert float(loss_after) < float(loss_before)
    assert np.all(np.isfinite(np.asarray(state.syn_images)))


def test_expert_training_and_buffer_roundtrip(tiny_data, tmp_path):
    cfg = BufferConfig(model="ConvNet3D", num_experts=2, train_epochs=3,
                       lr_teacher=0.01, batch_train=8, frames=8,
                       save_interval=2, buffer_path=str(tmp_path / "buf"))
    paths = generate_buffers(tiny_data, cfg)
    assert len(paths) == 1
    buf = TrajectoryBuffer.load(paths[0])
    assert buf.trajectories.shape[0] == 2  # experts
    assert buf.trajectories.shape[1] == 4  # init + 3 epochs
    # EVERY adjacent snapshot pair moves: param_dist == 0 for any MTT
    # segment divides grand_loss by zero. The reference's buffer.py:75,89
    # has exactly this bug on CPU (p.detach().cpu() is a no-op alias, so
    # all saved snapshots are the final params — found r4); guard our
    # dense-trajectory path against the class.
    for e in range(buf.trajectories.shape[0]):
        for s in range(buf.trajectories.shape[1] - 1):
            dist = float(np.sum((buf.trajectories[e, s + 1]
                                 - buf.trajectories[e, s]) ** 2))
            assert dist > 0.0, f"expert {e} segment {s} did not move"


def test_expert_sampler_cycles():
    t = np.zeros((3, 5, 7), np.float32)
    bufs = [TrajectoryBuffer(t), TrajectoryBuffer(t + 1)]
    s = ExpertSampler(bufs, np.random.default_rng(0))
    for _ in range(10):
        th0, th1, ep = s.sample_segment(max_start_epoch=3, expert_epochs=1)
        assert th0.shape == (7,) and 0 <= ep < 3


def test_batch_plan_without_replacement():
    rng = np.random.default_rng(0)
    plan = make_batch_plan(rng, n=10, batch_syn=10, syn_steps=3)
    assert plan.shape == (3, 10)
    for row in plan:
        assert sorted(row.tolist()) == list(range(10))
    # ragged case: chunks of 4 over n=10 -> sizes 4,4,2 popped from the end
    plan = make_batch_plan(rng, n=10, batch_syn=4, syn_steps=3)
    assert (plan[0] >= 0).sum() == 2  # remainder chunk pops first
    all_idx = plan[plan >= 0]
    assert sorted(all_idx.tolist()) == list(range(10))


def test_mtt_step_runs_and_updates(tiny_data):
    meta = tiny_data.meta
    syn, labels = init_synthetic_raw(jax.random.PRNGKey(0), tiny_data.train,
                                     ipc=2, frames=8, init="real")
    n = syn.shape[0]
    # fabricate a 2-epoch expert trajectory from two random inits
    from video_distillation_tpu.distill.mtt import flat_param_template
    _, _, flat0, _ = flat_param_template("ConvNet3D", 3, 3, (64, 64), 8,
                                         seed=0)
    _, _, flat1, _ = flat_param_template("ConvNet3D", 3, 3, (64, 64), 8,
                                         seed=1)
    step_fn = _build_mtt_step("ConvNet3D", 3, 3, (64, 64), 8, syn_steps=3,
                              lr_img=100.0, lr_lr=1e-5, train_lr=True,
                              compute_dtype="float32")
    rng = np.random.default_rng(0)
    plan = jnp.asarray(make_batch_plan(rng, n, n, 3))
    syn_lr = jnp.asarray(0.01)
    mom_img = jnp.zeros_like(syn)
    mom_lr = jnp.zeros(())
    syn_before = np.asarray(syn).copy()  # syn is donated by the step
    out = step_fn(jax.random.PRNGKey(5), syn, labels, syn_lr, mom_img,
                  mom_lr, jnp.asarray(flat0), jnp.asarray(flat1), plan)
    new_syn, new_lr, mom_img, mom_lr, loss, ploss, pdist = out
    assert np.isfinite(float(loss))
    assert float(pdist) > 0
    assert not np.allclose(np.asarray(new_syn), syn_before)
    assert float(new_lr) >= 0.001


def test_s2d_dm_step_runs_and_learns(tiny_data):
    """The S2D-DM path (distill_s2d_ms.py:312-445) was the one trainer
    with no test: compose-from-slots feature-mean matching must run
    NaN-free and reduce the loss under a fixed probe net at modest LRs
    (the path is as LR-sensitive as the reference; divergence at the
    generic defaults is expected and not asserted here)."""
    from video_distillation_tpu.distill.dm import (init_s2d_momentum,
                                                   make_s2d_dm_trainer)
    from video_distillation_tpu.distill.s2d import S2DConfig, init_s2d_state

    meta = tiny_data.meta
    s2d_cfg = S2DConfig(num_classes=meta.num_classes, spc=2, dpc=2, vpc=1,
                        n_hal=1, frames=8, im_size=tuple(meta.im_size))
    state = init_s2d_state(jax.random.PRNGKey(0), s2d_cfg)
    trainer = make_s2d_dm_trainer(tiny_data.train, "ConvNet3D", s2d_cfg,
                                  batch_real=4, lr_static=0.0,
                                  lr_dynamic=1e-4, lr_hal=1e-4,
                                  train_static=False, frames=8)
    moms = init_s2d_momentum(state)
    rng = np.random.default_rng(0)
    probe = jax.random.PRNGKey(7)

    def probe_loss(st, ms):
        st = jax.tree.map(lambda a: jnp.array(a, copy=True), st)
        ms = jax.tree.map(lambda a: jnp.array(a, copy=True), ms)
        return float(trainer(probe, st, ms, np.random.default_rng(1))[2])

    loss_before = probe_loss(state, moms)
    for it in range(15):
        state, moms, loss = trainer(jax.random.PRNGKey(100 + it), state,
                                    moms, rng)
        assert np.isfinite(float(loss))
    loss_after = probe_loss(state, moms)
    assert loss_after < loss_before
