"""Head-to-head statistical parity: the reference's own distill_baseline.py
(CPU torch) vs the TPU rebuild, on one shared tiny fixture.

This is the bridge between one-step numeric goldens
(tests/test_parity_golden.py) and real-data accuracy parity (SURVEY.md §6):
both implementations distill the SAME synthetic-video corpus with the SAME
hyperparameters, and we compare distilled-accuracy bands (mean +/- std over
num_eval fresh nets, at matching iterations) and loss trajectories.

The reference driver runs unmodified — ``main(args)`` from
``/root/reference/distill_baseline.py`` — with ``get_dataset``
monkeypatched to serve the shared fixture and wandb stubbed to capture its
logged scalars (wandb IS the reference's metrics channel,
distill_baseline.py:55-65).

Usage: python scripts/parity_head2head.py [--quick] [--out PARITY_RUNS.md]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
import types

import numpy as np

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# ---------------------------------------------------------------------------
# stubs: torchvision (absent in image) + wandb (capture channel)
# ---------------------------------------------------------------------------

def install_stubs():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.datasets = types.SimpleNamespace()
        tv.transforms = types.SimpleNamespace(
            Compose=lambda *a, **k: None, ToTensor=lambda *a, **k: None,
            Normalize=lambda *a, **k: None, Resize=lambda *a, **k: None,
            CenterCrop=lambda *a, **k: None,
            RandomCrop=lambda *a, **k: None)
        tv.utils = types.SimpleNamespace()
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.datasets"] = tv.datasets
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.utils"] = tv.utils

    logged = []

    class _Config:
        _items = {}

    wandb = types.ModuleType("wandb")
    wandb.config = _Config()
    wandb.run = types.SimpleNamespace(name="parity")
    wandb._logged = logged

    def init(config=None, **kw):
        wandb.config._items = dict(vars(config)) if config else {}
        return wandb.run

    def log(scalars, step=None, **kw):
        logged.append((step, dict(scalars)))

    wandb.init = init
    wandb.log = log
    wandb.finish = lambda *a, **k: None
    sys.modules["wandb"] = wandb
    return wandb


# ---------------------------------------------------------------------------
# shared fixture -> torch datasets
# ---------------------------------------------------------------------------

def build_torch_datasets(data):
    """Wrap the packed fixture in the reference's dataset contract:
    items are (normalized float (F, C, H, W), label); train has .labels;
    the test split resamples a temporal window per access
    (dataset.py:432-435) and randomly hflips (:400-403)."""
    import torch

    meta = data.meta
    mean = np.asarray(meta.mean, np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(meta.std, np.float32).reshape(1, 3, 1, 1)

    class TrainDS(torch.utils.data.Dataset):
        labels = data.train.labels.tolist()

        def __len__(self):
            return len(data.train)

        def __getitem__(self, i):
            clip = data.train.clips[i].astype(np.float32) / 255.0
            clip = (clip.transpose(0, 3, 1, 2) - mean) / std
            return torch.from_numpy(clip), int(data.train.labels[i])

    class TestDS(torch.utils.data.Dataset):
        rng = np.random.default_rng(777)

        def __len__(self):
            return len(data.test)

        def __getitem__(self, i):
            from video_distillation_tpu.data.store import (clip_indices,
                                                           sample_start)
            o0, o1 = data.test.offsets[i], data.test.offsets[i + 1]
            ln = int(o1 - o0)
            start, skip = sample_start(self.rng, ln, meta.frames)
            idx = o0 + np.clip(clip_indices(start, skip, meta.frames), 0,
                               ln - 1)
            clip = data.test.frames[idx].astype(np.float32) / 255.0
            if self.rng.random() > 0.5:
                clip = clip[:, :, ::-1]
            clip = (np.ascontiguousarray(clip).transpose(0, 3, 1, 2)
                    - mean) / std
            return torch.from_numpy(clip), int(data.test.labels[i])

    return TrainDS(), TestDS()


def _force_final_eval(ref_driver):
    """The reference calls evaluate_synset(test_freq=100/200); with
    epoch_eval_train < test_freq its test branch (utils.py:868) never
    fires and ``acc_test`` is unbound at the final print (utils.py:882)
    — a reference-internal bug at small fixture scale.  Forcing
    test_freq=None selects the ``ep == Epoch`` final-eval branch, the
    intended semantics at full scale.  Returns an undo callable."""
    orig = ref_driver.evaluate_synset

    def final_only(*a, **kw):
        kw["test_freq"] = None
        return orig(*a, **kw)

    ref_driver.evaluate_synset = final_only
    return lambda: setattr(ref_driver, "evaluate_synset", orig)


def run_reference_dm(data, hp, wandb_stub):
    """Run /root/reference/distill_baseline.py main() unmodified (DM)."""
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import distill_baseline as ref_driver  # noqa

    meta = data.meta
    dst_train, dst_test = build_torch_datasets(data)
    testloader = torch.utils.data.DataLoader(dst_test, batch_size=64,
                                             shuffle=False, num_workers=0)

    def fake_get_dataset(dataset, data_path):
        return (3, tuple(meta.im_size), meta.num_classes, None,
                list(meta.mean), list(meta.std), dst_train, dst_test,
                testloader)

    args = argparse.Namespace(
        dataset="parity-fixture", method="DM", model="ConvNet3D",
        ipc=hp["ipc"], eval_mode="S", outer_loop=1, inner_loop=1,
        num_eval=hp["num_eval"], eval_it=hp["eval_it"],
        epoch_eval_train=hp["epoch_eval_train"],
        Iteration=hp["Iteration"], lr_net=hp["lr_net"],
        lr_img=hp["lr_img"], lr_lr=1e-5, lr_teacher=0.01, train_lr=False,
        batch_real=hp["batch_real"], batch_train=hp["batch_train"],
        batch_syn=None, init="real", data_path="", expert_epochs=1,
        syn_steps=1, max_start_epoch=1, dis_metric="ours",
        buffer_path=None, num_workers=0, preload=False,
        save_path="/tmp/parity_ref", frames=meta.frames)

    np.random.seed(hp["seed"])
    torch.manual_seed(hp["seed"])
    wandb_stub._logged.clear()
    orig = ref_driver.get_dataset
    ref_driver.get_dataset = fake_get_dataset
    undo_eval = _force_final_eval(ref_driver)
    try:
        t0 = time.time()
        ref_driver.main(args)
        wall = time.time() - t0
    finally:
        ref_driver.get_dataset = orig
        undo_eval()

    accs, stds, losses = {}, {}, {}
    for step, scalars in wandb_stub._logged:
        if "Accuracy/ConvNet3D" in scalars:
            accs[step] = float(scalars["Accuracy/ConvNet3D"])
        if "Std/ConvNet3D" in scalars:
            stds[step] = float(scalars["Std/ConvNet3D"])
        if "Loss" in scalars:
            losses[step] = float(scalars["Loss"])
    return {"acc": accs, "std": stds, "loss": losses, "wall_sec": wall}


def run_rebuild_dm(data, hp):
    """The rebuild's DM loop at identical hyperparameters."""
    import jax
    import jax.numpy as jnp

    from video_distillation_tpu.distill.dm import (DMState,
                                                   init_synthetic_raw,
                                                   make_dm_trainer)
    from video_distillation_tpu.distill.evaluate import (EvalConfig,
                                                         evaluate_many)

    rng = np.random.default_rng(hp["seed"])
    test_rng = np.random.default_rng(hp["seed"] + 123)
    key = jax.random.PRNGKey(hp["seed"])
    syn, labels = init_synthetic_raw(key, data.train, hp["ipc"],
                                     data.meta.frames, "real", rng)
    state = DMState(syn, labels, jnp.zeros_like(syn))
    trainer = make_dm_trainer(data.train, "ConvNet3D", hp["ipc"],
                              hp["batch_real"], hp["lr_img"],
                              data.meta.frames, "float32")
    ecfg = EvalConfig(model="ConvNet3D",
                      epoch_eval_train=hp["epoch_eval_train"],
                      lr_net=hp["lr_net"], batch_train=hp["batch_train"])
    accs, stds, losses = {}, {}, {}
    t0 = time.time()
    for it in range(hp["Iteration"] + 1):
        if it % hp["eval_it"] == 0:
            _, mean, std = evaluate_many(
                jax.random.fold_in(key, 10_000_000 + it), hp["num_eval"],
                state.syn_images, np.asarray(state.labels), data, ecfg,
                test_rng)
            accs[it], stds[it] = mean, std
            print(f"[rebuild] it={it} acc={mean:.4f}+-{std:.4f}")
        if it == hp["Iteration"]:
            break
        state, loss = trainer(jax.random.fold_in(key, it), state, rng)
        if it % hp["eval_it"] == 0:
            losses[it] = float(loss) / data.meta.num_classes
    return {"acc": accs, "std": stds, "loss": losses,
            "wall_sec": time.time() - t0}


# ---------------------------------------------------------------------------
# MTT head-to-head: shared expert buffer, reference driver vs rebuild
# ---------------------------------------------------------------------------

def load_reference_buffer_module():
    """Import the reference's buffer.py with ONE environment fix: its
    trajectory snapshots are ``p.detach().cpu()`` (buffer.py:75,89) —
    a real copy on the CUDA device it was written for, but a NO-OP
    ALIAS on a CPU run, which saves N+1 identical copies of the FINAL
    params (param_dist==0 -> grand_loss=inf for every segment).  We
    append ``.clone()`` to restore the intended copy-on-snapshot
    semantics; everything else runs unmodified."""
    import importlib.util

    src_path = os.path.join(REF, "buffer.py")
    with open(src_path) as f:
        src = f.read()
    patched = src.replace("p.detach().cpu() for p in",
                          "p.detach().cpu().clone() for p in")
    assert patched != src, "buffer.py snapshot lines not found"
    if REF not in sys.path:
        sys.path.insert(0, REF)
    spec = importlib.util.spec_from_loader("ref_buffer_cpufix", loader=None,
                                           origin=src_path)
    mod = importlib.util.module_from_spec(spec)
    mod.__file__ = src_path
    exec(compile(patched, src_path, "exec"), mod.__dict__)
    return mod


def run_reference_buffer(data, hp, buffer_dir):
    """Train experts with the reference's own buffer.py on the fixture."""
    ref_buffer = load_reference_buffer_module()

    dst_train, dst_test = build_torch_datasets(data)
    import torch

    testloader = torch.utils.data.DataLoader(dst_test, batch_size=64,
                                             shuffle=False, num_workers=0)
    meta = data.meta

    def fake_get_dataset(dataset, data_path):
        return (3, tuple(meta.im_size), meta.num_classes, None,
                list(meta.mean), list(meta.std), dst_train, dst_test,
                testloader)

    args = argparse.Namespace(
        dataset="parity-fixture", model="ConvNet3D",
        num_experts=hp["num_experts"], lr_teacher=hp["lr_teacher_buf"],
        batch_train=hp["batch_train_buf"], batch_real=64, num_workers=0,
        data_path="", buffer_path=buffer_dir,
        train_epochs=hp["train_epochs"], decay=False, mom=0, l2=0,
        save_interval=hp["num_experts"], preload=False,
        frames=meta.frames,
        # epoch() reads eval_mode (utils.py:841) even though buffer.py's
        # own argparse never defines it — it normally arrives via the
        # shared CLI surface
        eval_mode="S")
    np.random.seed(hp["seed"])
    torch.manual_seed(hp["seed"])
    orig = ref_buffer.get_dataset
    ref_buffer.get_dataset = fake_get_dataset
    try:
        ref_buffer.main(args)
    finally:
        ref_buffer.get_dataset = orig


def convert_torch_buffer(data, buffer_dir):
    """replay_buffer_0.pt (lists of per-layer torch tensors) -> the
    rebuild's TrajectoryBuffer flat-array format, via the named flax
    param tree (no reliance on parameters() ordering vs ravel order)."""
    import torch
    from jax.flatten_util import ravel_pytree

    from video_distillation_tpu.distill.mtt import TrajectoryBuffer

    meta = data.meta

    def port_conv(w):
        return np.asarray(w.detach().numpy().transpose(2, 3, 4, 1, 0))

    def snapshot_to_flat(snap):
        # parameters() order for norm-free ConvNet3D: (weight, bias) per
        # features conv (3), then logit conv
        params = {}
        for i in range(3):
            params[f"TemporalIm2ColConv_{i}"] = {
                "kernel": port_conv(snap[2 * i]),
                "bias": np.asarray(snap[2 * i + 1].detach().numpy())}
        params["TorchConv_0"] = {"Conv_0": {
            "kernel": port_conv(snap[6]),
            "bias": np.asarray(snap[7].detach().numpy())}}
        flat, _ = ravel_pytree(params)
        return np.asarray(flat, np.float32)

    buf = torch.load(os.path.join(buffer_dir, "replay_buffer_0.pt"))
    trajs = np.stack([np.stack([snapshot_to_flat(s) for s in traj])
                      for traj in buf])
    return TrajectoryBuffer(trajs)


def run_reference_mtt(data, hp, buffer_dir, wandb_stub):
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import distill_baseline as ref_driver  # noqa

    meta = data.meta
    dst_train, dst_test = build_torch_datasets(data)
    testloader = torch.utils.data.DataLoader(dst_test, batch_size=64,
                                             shuffle=False, num_workers=0)

    def fake_get_dataset(dataset, data_path):
        return (3, tuple(meta.im_size), meta.num_classes, None,
                list(meta.mean), list(meta.std), dst_train, dst_test,
                testloader)

    args = argparse.Namespace(
        dataset="parity-fixture", method="MTT", model="ConvNet3D",
        ipc=hp["ipc"], eval_mode="S", outer_loop=1, inner_loop=1,
        num_eval=hp["num_eval"], eval_it=hp["eval_it"],
        epoch_eval_train=hp["epoch_eval_train"],
        Iteration=hp["Iteration"], lr_net=hp["lr_net"],
        lr_img=hp["lr_img"], lr_lr=hp["lr_lr"],
        lr_teacher=hp["lr_teacher"], train_lr=True,
        batch_real=64, batch_train=hp["batch_train"],
        batch_syn=meta.num_classes * hp["ipc"],
        init=hp.get("init", "real"),
        data_path="", expert_epochs=hp["expert_epochs"],
        syn_steps=hp["syn_steps"],
        max_start_epoch=hp["max_start_epoch"], dis_metric="ours",
        buffer_path=buffer_dir, num_workers=0, preload=False,
        save_path="/tmp/parity_ref_mtt", frames=meta.frames,
        distributed=False)

    np.random.seed(hp["seed"])
    torch.manual_seed(hp["seed"])
    import random as _random

    _random.seed(hp["seed"])
    wandb_stub._logged.clear()
    orig = ref_driver.get_dataset
    ref_driver.get_dataset = fake_get_dataset
    undo_eval = _force_final_eval(ref_driver)
    try:
        t0 = time.time()
        ref_driver.main(args)
        wall = time.time() - t0
    finally:
        ref_driver.get_dataset = orig
        undo_eval()

    accs, stds, gloss, synlr = {}, {}, [], {}
    for step, scalars in wandb_stub._logged:
        if "Accuracy/ConvNet3D" in scalars:
            accs[step] = float(scalars["Accuracy/ConvNet3D"])
        if "Std/ConvNet3D" in scalars:
            stds[step] = float(scalars["Std/ConvNet3D"])
        if "Grand_Loss" in scalars:
            # the reference logs Grand_Loss with no step= (collapses in
            # wandb too); keep the whole trajectory as a list
            gloss.append(float(scalars["Grand_Loss"]))
        if "Synthetic_LR" in scalars:
            synlr[step] = float(scalars["Synthetic_LR"])
    return {"acc": accs, "std": stds, "grand_loss": gloss,
            "syn_lr": synlr, "wall_sec": wall}


def run_rebuild_mtt(data, hp, buffers):
    import jax
    import jax.numpy as jnp

    from video_distillation_tpu.distill.dm import init_synthetic_raw
    from video_distillation_tpu.distill.evaluate import (EvalConfig,
                                                         evaluate_many)
    from video_distillation_tpu.distill.mtt import (ExpertSampler,
                                                    _build_mtt_step,
                                                    make_batch_plan)

    meta = data.meta
    rng = np.random.default_rng(hp["seed"])
    test_rng = np.random.default_rng(hp["seed"] + 123)
    key = jax.random.PRNGKey(hp["seed"])
    syn, labels = init_synthetic_raw(key, data.train, hp["ipc"],
                                     meta.frames, hp.get("init", "real"),
                                     rng)
    n_syn = syn.shape[0]
    step_fn = _build_mtt_step(
        "ConvNet3D", 3, meta.num_classes, tuple(meta.im_size),
        meta.frames, syn_steps=hp["syn_steps"], lr_img=hp["lr_img"],
        lr_lr=hp["lr_lr"], train_lr=True, compute_dtype="float32")
    sampler = ExpertSampler(buffers, rng)
    mom_img = jnp.zeros_like(syn)
    mom_lr = jnp.zeros(())
    syn_lr = jnp.asarray(float(hp["lr_teacher"]))
    ecfg = EvalConfig(model="ConvNet3D",
                      epoch_eval_train=hp["epoch_eval_train"],
                      lr_net=hp["lr_net"], batch_train=hp["batch_train"])
    accs, stds, gloss = {}, {}, {}
    t0 = time.time()
    for it in range(hp["Iteration"] + 1):
        if it % hp["eval_it"] == 0:
            # reference semantics: eval nets train at the CURRENT learned
            # syn_lr (distill_baseline.py:157 args.lr_net = syn_lr)
            ecfg_it = dataclasses.replace(ecfg, lr_net=float(syn_lr))
            _, mean, std = evaluate_many(
                jax.random.fold_in(key, 20_000_000 + it), hp["num_eval"],
                syn, np.asarray(labels), data, ecfg_it, test_rng)
            accs[it], stds[it] = mean, std
            print(f"[rebuild-mtt] it={it} acc={mean:.4f}+-{std:.4f}")
        if it == hp["Iteration"]:
            break
        th0, th1, _ = sampler.sample_segment(hp["max_start_epoch"],
                                             hp["expert_epochs"])
        plan = jnp.asarray(make_batch_plan(
            rng, n_syn, meta.num_classes * hp["ipc"], hp["syn_steps"]))
        out = step_fn(jax.random.fold_in(key, it), syn, labels, syn_lr,
                      mom_img, mom_lr, jnp.asarray(th0),
                      jnp.asarray(th1), plan)
        syn, syn_lr, mom_img, mom_lr, loss = out[:5]
        if it % hp["eval_it"] == 0:
            gloss[it] = float(loss)
    return {"acc": accs, "std": stds, "grand_loss": gloss,
            "wall_sec": time.time() - t0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the rebuild onto CPU (frees the TPU; "
                         "env vars are too late — sitecustomize already "
                         "imported jax)")
    ap.add_argument("--mtt", action="store_true",
                    help="also run the MTT head-to-head on a shared "
                         "expert buffer (trained by the reference's own "
                         "buffer.py and converted)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--json", default="/tmp/parity_dm.json")
    ap.add_argument("--mtt_only", action="store_true",
                    help="skip the DM legs (reuse for MTT re-runs)")
    ap.add_argument("--mtt_lr_img", type=float, default=100.0,
                    help="MTT lr_img (the reference scripts tune this "
                         "per dataset; 100 diverges on the tiny fixture "
                         "— both sides — use ~10 for a training run)")
    ap.add_argument("--mtt_init", default="real",
                    choices=("real", "noise"),
                    help="synthetic init for the MTT leg — noise starts "
                         "both sides at chance so LEARNING is visible "
                         "(real init saturates the separable fixture)")
    ap.add_argument("--seed", type=int, default=0,
                    help="run-RNG seed (batch plans, segment sampling, "
                         "eval nets); the FIXTURE stays seed-fixed so "
                         "multi-seed runs stay comparable")
    ap.add_argument("--mtt_iters", type=int, default=None)
    ap.add_argument("--mtt_eval_it", type=int, default=None)
    ap.add_argument("--mtt_num_eval", type=int, default=None)
    ap.add_argument("--mtt_epoch_eval", type=int, default=None)
    ap.add_argument("--mtt_syn_steps", type=int, default=None)
    ap.add_argument("--mtt_lr_lr", type=float, default=None)
    ap.add_argument("--mtt_lr_teacher", type=float, default=None)
    ap.add_argument("--mtt_experts", type=int, default=None)
    ap.add_argument("--mtt_train_epochs", type=int, default=None)
    ap.add_argument("--mtt_max_start", type=int, default=None)
    ap.add_argument("--mtt_lr_teacher_buf", type=float, default=None,
                    help="expert-training LR (buffer.py lr_teacher)")
    ap.add_argument("--mtt_batch_train_buf", type=int, default=None)
    ap.add_argument("--mtt_expert_epochs", type=int, default=None)
    ap.add_argument("--buffer_dir", default="/tmp/parity_buf",
                    help="expert-buffer cache dir (reference-trained; "
                         "reused if replay_buffer_0.pt exists)")
    ap.add_argument("--side", default="both",
                    choices=("both", "ref", "rebuild"),
                    help="run only one MTT side (cheap reference-side "
                         "LR probes before committing to a full "
                         "head-to-head)")
    ap.add_argument("--sep", type=float, default=None,
                    help="fixture class_sep override (lower = harder; "
                         "pairs with a fresh --buffer_dir)")
    ap.add_argument("--noise", type=float, default=None,
                    help="fixture per-pixel noise override (higher = "
                         "harder)")
    ap.add_argument("--clips", type=int, default=None,
                    help="fixture clips_per_class override")
    ap.add_argument("--fixture_name", default=None,
                    help="registry name for a custom-hardness fixture")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    wandb_stub = install_stubs()

    from video_distillation_tpu.data import make_synthetic_video_data

    if args.quick:
        hp = dict(ipc=1, num_eval=2, eval_it=10, epoch_eval_train=10,
                  Iteration=20, lr_net=0.01, lr_img=1.0, batch_real=4,
                  batch_train=64, seed=args.seed)
        data = make_synthetic_video_data(num_classes=3, clips_per_class=6,
                                         test_per_class=3, frames=8,
                                         im_size=(64, 64),
                                         name="parity-quick")
    else:
        hp = dict(ipc=1, num_eval=3, eval_it=50, epoch_eval_train=50,
                  Iteration=150, lr_net=0.01, lr_img=1.0, batch_real=8,
                  batch_train=64, seed=args.seed)
        # class_sep/noise tuned so accuracies sit mid-range: saturated
        # 1.0 bands on both sides would compare nothing
        sep = 0.22 if args.sep is None else args.sep
        noi = 45.0 if args.noise is None else args.noise
        cpc = 25 if args.clips is None else args.clips
        nm = args.fixture_name or (
            "parity4" if (args.sep is None and args.noise is None
                          and args.clips is None)
            else f"parity4_s{sep}_n{noi}_c{cpc}")
        data = make_synthetic_video_data(num_classes=4, clips_per_class=cpc,
                                         test_per_class=5, frames=8,
                                         im_size=(64, 64), class_sep=sep,
                                         noise=noi, name=nm)

    import torch
    torch.set_num_threads(os.cpu_count() or 8)
    if args.mtt_only:
        report = {"hp": hp}
    else:
        print("=== rebuild DM ===")
        ours = run_rebuild_dm(data, hp)
        print("=== reference DM (torch CPU) ===")
        ref = run_reference_dm(data, hp, wandb_stub)
        report = {"hp": hp, "reference": ref, "rebuild": ours}

    if args.mtt or args.mtt_only:
        if args.quick:
            mhp = dict(hp, num_experts=2, train_epochs=4,
                       lr_teacher_buf=0.01, batch_train_buf=16,
                       lr_teacher=0.01, lr_img=args.mtt_lr_img,
                       lr_lr=1e-5, syn_steps=2, expert_epochs=1,
                       max_start_epoch=3, Iteration=20, eval_it=10)
        else:
            mhp = dict(hp, num_experts=3, train_epochs=10,
                       lr_teacher_buf=0.01, batch_train_buf=32,
                       lr_teacher=0.01, lr_img=args.mtt_lr_img,
                       lr_lr=1e-5, syn_steps=5, expert_epochs=1,
                       max_start_epoch=8, Iteration=150, eval_it=50)
        mhp["init"] = args.mtt_init
        for k, v in (("Iteration", args.mtt_iters),
                     ("eval_it", args.mtt_eval_it),
                     ("num_eval", args.mtt_num_eval),
                     ("epoch_eval_train", args.mtt_epoch_eval),
                     ("syn_steps", args.mtt_syn_steps),
                     ("lr_lr", args.mtt_lr_lr),
                     ("lr_teacher", args.mtt_lr_teacher),
                     ("num_experts", args.mtt_experts),
                     ("train_epochs", args.mtt_train_epochs),
                     ("max_start_epoch", args.mtt_max_start),
                     ("lr_teacher_buf", args.mtt_lr_teacher_buf),
                     ("batch_train_buf", args.mtt_batch_train_buf),
                     ("expert_epochs", args.mtt_expert_epochs)):
            if v is not None:
                mhp[k] = v
        buffer_dir = args.buffer_dir
        os.makedirs(buffer_dir, exist_ok=True)
        if not os.path.exists(os.path.join(buffer_dir,
                                           "replay_buffer_0.pt")):
            print("=== reference buffer.py (shared experts) ===")
            run_reference_buffer(data, mhp, buffer_dir)
        ours_mtt = ref_mtt = None
        if args.side in ("both", "rebuild"):
            buffers = [convert_torch_buffer(data, buffer_dir)]
            print("=== rebuild MTT (shared buffer) ===")
            ours_mtt = run_rebuild_mtt(data, mhp, buffers)
        if args.side in ("both", "ref"):
            print("=== reference MTT (torch CPU, shared buffer) ===")
            ref_mtt = run_reference_mtt(data, mhp, buffer_dir, wandb_stub)
        report["mtt"] = {"hp": mhp, "reference": ref_mtt,
                         "rebuild": ours_mtt}
    with open(args.json, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))

    if args.out:
        lines = ["# DM head-to-head: reference driver vs rebuild",
                 "", f"Shared fixture: {data.meta.name} "
                 f"({data.meta.num_classes} classes, "
                 f"{len(data.train)} train clips, "
                 f"{data.meta.im_size[0]}px x {data.meta.frames}f); "
                 f"hyperparameters: {hp}", "",
                 "| iter | reference top-1 | rebuild top-1 | bands overlap |",
                 "|---|---|---|---|"]
        if args.mtt_only:
            lines = lines[:1] + ["", "(MTT-only re-run)"]
        else:
            for it in sorted(ours["acc"]):
                ra, rs = ref["acc"].get(it), ref["std"].get(it, 0.0)
                oa, os_ = ours["acc"][it], ours["std"][it]
                if ra is None:
                    continue
                overlap = abs(ra - oa) <= (rs + os_ + 1e-9)
                lines.append(f"| {it} | {ra:.4f} +- {rs:.4f} | "
                             f"{oa:.4f} +- {os_:.4f} | "
                             f"{'yes' if overlap else 'NO'} |")
        if "mtt" in report and report["mtt"]["reference"] is not None \
                and report["mtt"]["rebuild"] is not None:
            m = report["mtt"]
            lines += ["", "# MTT head-to-head (shared expert buffer)",
                      "", f"hyperparameters: {m['hp']}", "",
                      "| iter | reference top-1 | rebuild top-1 | "
                      "ref grand loss | rebuild grand loss | overlap |",
                      "|---|---|---|---|---|---|"]
            rm, om = m["reference"], m["rebuild"]
            for it in sorted(om["acc"]):
                ra, rs = rm["acc"].get(it), rm["std"].get(it, 0.0)
                oa, os_ = om["acc"][it], om["std"][it]
                if ra is None:
                    continue
                overlap = abs(ra - oa) <= (rs + os_ + 1e-9)
                rgl = rm["grand_loss"]
                rg = (rgl[min(it, len(rgl) - 1)]
                      if isinstance(rgl, list) and rgl else
                      rgl.get(it) if isinstance(rgl, dict) else None)
                og = om["grand_loss"].get(it)
                rg_s = f"{rg:.4f}" if rg is not None else "-"
                og_s = f"{og:.4f}" if og is not None else "-"
                lines.append(f"| {it} | {ra:.4f} +- {rs:.4f} | "
                             f"{oa:.4f} +- {os_:.4f} | {rg_s} | {og_s} |"
                             f" {'yes' if overlap else 'NO'} |")
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")
        print("wrote", args.out)


if __name__ == "__main__":
    main()
