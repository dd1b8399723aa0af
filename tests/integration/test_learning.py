"""Training-path LEARNING proof (round-4 VERDICT item #1, the top item).

Every earlier training test showed loss decreasing over a handful of steps;
none demonstrated the full production path — WLASL index → decode pool →
augmented fused train step → periodic eval with pad-aware counting —
can drive a model from chance to high held-out accuracy. A subtly wrong
gradient path (BN-stat handling, augment geometry, label alignment through
the loader/padding) passes loss-goes-down tests and fails exactly this one.

Task: :func:`asltpu.data.synthetic.make_separable_wlasl` — the gloss is a
hue direction chosen to survive the whole pipeline (codec chroma
subsampling, uniform temporal sampling, random resized crop, hflip,
brightness/contrast jitter), with all other video content drawn as per-clip
nuisance so the model must learn the class signal, not clip identity. The
``val`` split uses disjoint nuisance seeds.

Recorded reference run (2026-08-19, CPU mesh, ~1.2 steps/s): eval_top1
0.125 → 0.667 → 0.792 (step 120) → 0.875 → 0.917 (step 300); chance 1/6.
The same configuration runs here; the assertion leaves margin for XLA:CPU
reduction nondeterminism (the dataset, loader shuffle, augment RNG, and
init are all seeded).
"""

import csv
import os

import pytest


def _run_cli_learning(tmp_path, model, set_overrides, frames):
    """Shared body of every CLI learning proof (one place for dataset
    construction, train flags, and the CSV assertions — ADVICE r4 #1):
    full CLI train of ``model`` on the separable task with augmentation ON
    (random resized crop + flip + color jitter are part of the path being
    proven), periodic pad-aware eval, and a ≥0.8 final held-out top-1 gate
    (chance 1/6). Returns the eval trajectory."""
    from asltpu.cli.main import main
    from asltpu.data.synthetic import make_separable_wlasl

    index, videos = make_separable_wlasl(
        str(tmp_path / "data"), num_glosses=6, train_per_gloss=8,
        val_per_gloss=4, num_frames=24, size=(96, 96),
    )
    log_dir = str(tmp_path / "logs")
    argv = ["train", "--model", model, "--num-classes", "6"]
    for ov in set_overrides:
        argv += ["--set", ov]
    argv += [
        "--index", index, "--videos", videos,
        "--batch", "8", "--steps", "300", "--lr", "2e-3", "--warmup", "10",
        "--log-every", "50", "--eval-split", "val", "--eval-every", "75",
        "--ckpt-dir", str(tmp_path / "ck"), "--ckpt-every", "300",
        "--frames", str(frames), "--crop", "32",
        "--log-dir", log_dir,
    ]
    rc = main(argv)
    assert rc == 0

    with open(os.path.join(log_dir, "train_metrics_eval.csv")) as f:
        rows = list(csv.DictReader(f))
    assert rows, "no eval metrics written"
    traj = [(int(float(r["step"])), float(r["eval_top1"])) for r in rows]
    final_step, final_top1 = traj[-1]
    assert final_step == 300
    # Anything below 0.8 on this seeded setup (recorded runs: 0.917 CPU
    # mesh, 0.958 real TPU) means the gradient/label path regressed.
    assert final_top1 >= 0.8, f"{model} failed to learn: top1 {traj}"
    # Every eval scored the full held-out split (pad rows excluded, none
    # dropped): 6 glosses × 4 val clips.
    assert all(float(r["eval_clips"]) == 24.0 for r in rows)
    return traj


def _run_learning(tmp_path):
    """The mobilenet_gru learning proof (loader/augment/label path)."""
    return _run_cli_learning(
        tmp_path, "mobilenet_gru",
        ("width_mult=0.5", "gru_hidden=32"), frames=4,
    )


@pytest.mark.slow
def test_train_path_learns_separable_task(tmp_path):
    _run_learning(tmp_path)


@pytest.mark.slow
def test_train_path_learns_on_tpu(tmp_path):
    """The same proof through the REAL device path (remote-compiled train
    step, device augment, relay transfers). Run with ASLTPU_TEST_TPU=1;
    skipped on the default CPU mesh. Recorded 2026-08-19: 0.958 final
    top-1, wall 193 s."""
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs the real TPU (ASLTPU_TEST_TPU=1)")
    _run_learning(tmp_path)


@pytest.mark.slow
def test_i3d_train_path_learns_on_tpu(tmp_path):
    """The learning proof for the family that actually CARRIES the train
    obligation (``BASELINE.json:9``: I3D fine-tune, train + eval). The
    mobilenet_gru proof above exercises the loader/augment/label path; this
    one additionally drives the 3D-conv + s2d-stem gradient path (remat'd
    Inception blocks, fp32 BN stats under bf16 compute) from chance to
    high held-out top-1 through the same CLI. Frames=8 is the smallest
    temporal extent the pooling stack admits; dropout is lowered from the
    WLASL-2000 fine-tune default (0.5) — at 6 classes it only slows the
    300-step budget. Full-width I3D fwd+bwd is ~seconds/step on the CPU
    mesh, so this proof is TPU-gated (run with ASLTPU_TEST_TPU=1).
    Recorded 2026-08-19 (real TPU): see ROUND_NOTES.md."""
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs the real TPU (ASLTPU_TEST_TPU=1)")
    _run_cli_learning(tmp_path, "i3d", ("dropout=0.1",), frames=8)


@pytest.mark.slow
def test_resnet_transformer_train_path_learns_on_tpu(tmp_path):
    """The config-#3 family's learning proof: ResNet-18 (BN-heavy residual
    backbone) + pre-LN transformer head gradients through the same CLI
    path. The head is shrunk (d_model 64, 1 layer) — the 512-dim contract
    head only slows the 300-step budget at 6 classes — but the backbone is
    the full ResNet-18 graph. Full-width ResNet fwd+bwd is seconds/step on
    the 1-core CPU mesh, so this proof is TPU-gated (ASLTPU_TEST_TPU=1).
    Recorded 2026-08-20 (real TPU): see ROUND_NOTES.md."""
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs the real TPU (ASLTPU_TEST_TPU=1)")
    _run_cli_learning(
        tmp_path, "resnet_transformer",
        ("d_model=64", "num_tx_layers=1", "num_heads=2", "dropout=0.1"),
        frames=4,
    )


@pytest.mark.slow
def test_pose_train_path_learns_separable_motion(tmp_path):
    """The LANDMARK-family counterpart of the proof above: pose_bilstm
    through the library train path (normalize_landmarks → BiLSTM scan
    grads → label alignment) from chance (1/6) to high held-out top-1 on
    :func:`make_separable_landmarks` — gloss = the direction the right
    hand drifts RELATIVE to the body, with translation/scale/camera-drift
    nuisances the normalization must cancel and missing-detection zero
    frames the masking must preserve. A subtly wrong gradient through the
    scan cells or a normalization that destroys relative motion passes
    every loss-goes-down test and fails exactly this one."""
    import jax.numpy as jnp
    import numpy as np

    from asltpu.api import build_module
    from asltpu.config import PoseBiLSTMConfig, TrainConfig
    from asltpu.data.synthetic import make_separable_landmarks
    from asltpu.train.loop import train

    C, T, B = 6, 16, 16
    cfg = PoseBiLSTMConfig(
        num_classes=C, hidden_size=32, num_frames=T, dropout=0.1)
    module = build_module(cfg)
    tr_lm, tr_y = make_separable_landmarks(C, 8, num_frames=T, seed=0)
    va_lm, va_y = make_separable_landmarks(C, 4, num_frames=T, seed=7777)

    def batches():
        rng = np.random.default_rng(1)
        while True:
            idx = rng.choice(len(tr_y), B, replace=False)
            yield jnp.asarray(tr_lm[idx]), jnp.asarray(tr_y[idx])

    def eval_batches():
        # 24 val clips → batches of 16 + 8 (both divide the 8-device mesh).
        for i in range(0, len(va_y), B):
            yield jnp.asarray(va_lm[i:i + B]), jnp.asarray(va_y[i:i + B])

    evals = []

    def writer(step, metrics):
        if "eval_top1" in metrics:
            evals.append((step, float(metrics["eval_top1"])))

    tcfg = TrainConfig(
        batch_size=B, num_steps=150, warmup_steps=10, learning_rate=3e-3,
        log_every=1000, eval_every=50, ckpt_every=100_000,
        ckpt_dir=str(tmp_path / "ck"))
    train(module, tcfg, batches(), (jnp.zeros((1, T, 543, 3)),),
          metric_writer=writer, eval_batches=eval_batches)

    assert evals and evals[-1][0] == 150
    final = evals[-1][1]
    # Chance is 1/6 ≈ 0.167; the recorded seeded run (2026-08-19, CPU
    # mesh): 0.5 (step 50) → 0.958 → 1.0 (step 150). Anything below 0.9
    # means the landmark gradient path regressed.
    assert final >= 0.9, f"pose training failed to learn: {evals}"


@pytest.mark.slow
def test_fusion_train_learns_cross_modal_task(tmp_path):
    """The FUSION-family learning proof — and the only one that can prove
    the cross-attention itself carries signal. Task:
    :func:`asltpu.data.synthetic.make_separable_fusion` — the label
    factorizes as ``hue * num_drift + drift`` where the hue lives ONLY in
    the RGB clip and the drift direction ONLY in the landmarks. With
    ``num_hue=3, num_drift=2`` a model reading just the RGB stream caps at
    1/2 held-out top-1, just the landmark stream at 1/3; beating BOTH
    ceilings requires gradient to flow through, and the classifier to use,
    both streams and the fusion between them. A fusion block whose
    cross-attention collapsed (e.g. one stream's tokens zeroed, a
    projection unlearned) passes every loss-goes-down and parity test and
    fails exactly this one.

    Trains through the library path (the CLI train lane is RGB-decode-only
    by design; fusion trains via :func:`asltpu.train.loop.train` with
    TUPLE batches — the multi-input route added for it)."""
    import jax.numpy as jnp
    import numpy as np

    from asltpu.api import build_module
    from asltpu.config import (
        PreprocessConfig,
        TrainConfig,
        TwoStreamFusionConfig,
    )
    from asltpu.data.synthetic import make_separable_fusion
    from asltpu.train.loop import train

    NUM_HUE, NUM_DRIFT = 3, 2
    C, T, B = NUM_HUE * NUM_DRIFT, 4, 16
    cfg = TwoStreamFusionConfig(
        num_classes=C, num_frames=T, d_model=32, num_heads=2,
        num_fusion_layers=1, dropout=0.1, width_mult=0.5,
        preprocess=PreprocessConfig(num_frames=T),
    )
    module = build_module(cfg)
    # Train/val nuisances from disjoint seeds: 8 train + 4 val clips per
    # class. make_separable_fusion emits tensors already in the preprocess
    # OUTPUT space (ImageNet-normalized), so pp_cfg stays None.
    tr_clip, tr_lm, tr_y = make_separable_fusion(
        NUM_HUE, NUM_DRIFT, 8, num_frames=T, size=(32, 32), seed=0)
    va_clip, va_lm, va_y = make_separable_fusion(
        NUM_HUE, NUM_DRIFT, 4, num_frames=T, size=(32, 32), seed=7777)

    def batches():
        rng = np.random.default_rng(1)
        while True:
            idx = rng.choice(len(tr_y), B, replace=False)
            yield ((jnp.asarray(tr_clip[idx]), jnp.asarray(tr_lm[idx])),
                   jnp.asarray(tr_y[idx]))

    def eval_batches():
        # 24 val clips → batches of 16 + 8 (both divide the 8-device mesh).
        for i in range(0, len(va_y), B):
            yield ((jnp.asarray(va_clip[i:i + B]),
                    jnp.asarray(va_lm[i:i + B])),
                   jnp.asarray(va_y[i:i + B]))

    evals = []

    def writer(step, metrics):
        if "eval_top1" in metrics:
            evals.append((step, float(metrics["eval_top1"])))

    tcfg = TrainConfig(
        batch_size=B, num_steps=200, warmup_steps=10, learning_rate=3e-3,
        log_every=1000, eval_every=50, ckpt_every=100_000,
        ckpt_dir=str(tmp_path / "ck"))
    dummy = (jnp.zeros((1, T, 32, 32, 3)), jnp.zeros((1, T, 543, 3)))
    train(module, tcfg, batches(), dummy,
          metric_writer=writer, eval_batches=eval_batches)

    assert evals and evals[-1][0] == 200
    final = evals[-1][1]
    # Chance 1/6; RGB-only ceiling 1/2; landmark-only ceiling 1/3. The
    # recorded seeded run (2026-08-20, CPU mesh) reached 0.917, but on 24
    # val clips each misclassification quantizes the metric by 0.042 and
    # dropout is active — a benign RNG/reduction-order change across jax
    # versions could push a borderline run below a 0.9 bar (ADVICE r4 #2).
    # ≥0.75 still clears BOTH single-stream ceilings with a 6-clip margin,
    # which is the cross-modal claim this test exists to make.
    assert final >= 0.75, f"fusion training failed to learn: {evals}"


@pytest.mark.slow
def test_52class_grid_anchor_on_tpu(tmp_path):
    """The ≥50-class accuracy anchor (VERDICT r4 item #10), as a repeatable
    test: 52 classes = 13 base hues × 4 temporal hue-rotation rates
    (:func:`make_separable_wlasl_grid`, ``hard`` nuisance tier — per-channel
    white-balance gain, brightness offset, occluder, strong texture) through
    the FULL CLI train path. The rate factor makes the task temporal: an
    order-blind frame pooler sign-confuses ±rate pairs. Recorded anchor run
    (2026-08-20, real TPU, full 1500 steps): eval_top1 0.67 (step 150) →
    1.0 (step 300) → stable 1.0 plateau through 1500; see ROUND_NOTES.md.
    This test runs the first 400 steps of the same configuration and gates
    at ≥0.9 on the 208-clip held-out split. TPU-gated (ASLTPU_TEST_TPU=1);
    ~8 min wall."""
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs the real TPU (ASLTPU_TEST_TPU=1)")

    from asltpu.cli.main import main
    from asltpu.data.synthetic import make_separable_wlasl_grid

    index, videos = make_separable_wlasl_grid(str(tmp_path / "data"))
    log_dir = str(tmp_path / "logs")
    rc = main([
        "train", "--model", "mobilenet_gru", "--num-classes", "52",
        "--index", index, "--videos", videos,
        "--batch", "32", "--steps", "400", "--lr", "2e-3", "--warmup", "50",
        "--log-every", "100", "--eval-split", "val", "--eval-every", "100",
        "--ckpt-dir", str(tmp_path / "ck"), "--ckpt-every", "400",
        "--frames", "16", "--crop", "64", "--log-dir", log_dir,
    ])
    assert rc == 0
    with open(os.path.join(log_dir, "train_metrics_eval.csv")) as f:
        rows = list(csv.DictReader(f))
    traj = [(int(float(r["step"])), float(r["eval_top1"])) for r in rows]
    assert traj[-1][0] == 400
    assert all(float(r["eval_clips"]) == 208.0 for r in rows)
    assert traj[-1][1] >= 0.9, f"52-class anchor failed to learn: {traj}"
