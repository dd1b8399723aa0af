"""Continuous-recognition SEMANTIC proof: the sliding-window lane recovers
the true gloss SEQUENCE from an untrimmed multi-sign session.

`tests/unit/test_windows.py` proves the windows machinery (planning, segment
decode, merge tiling) on an untrained model; `tests/integration/
test_learning.py` proves the train path learns a single-clip task. Neither
shows the two compose — that a model trained through the production path,
applied to ONE continuous video of several signs back to back, yields a
timeline whose per-sign windows vote the right glosses in the right order.
A temporal misalignment between window spans and segment-aware decode (an
off-by-one in ClipRecord frame windows, a stride bug, landmark/RGB
desync) passes both existing proofs and fails exactly this one.

Task: :func:`asltpu.data.synthetic.write_separable_session` — the signs of
a known sequence written back to back into one mp4, each span carrying the
hue-direction class signal with per-sign nuisance. The model is trained on
the SEPARATE-clips dataset (disjoint nuisance seeds), so window accuracy
on the session measures the class signal through the windows lane, not
memorization.
"""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_windows_recover_sign_sequence(tmp_path):
    from asltpu import api
    from asltpu.cli.main import main
    from asltpu.data.synthetic import make_separable_wlasl, \
        write_separable_session
    from asltpu.windows import merge_windows, predict_windows

    num_glosses = 6
    index, videos = make_separable_wlasl(
        str(tmp_path / "data"), num_glosses=num_glosses, train_per_gloss=8,
        val_per_gloss=4, num_frames=24, size=(96, 96),
    )
    ckpt_dir = str(tmp_path / "ck")
    # The same recorded recipe as test_learning (reaches ~0.9 held-out
    # top-1); the final checkpoint at step 300 is what the windows lane
    # consumes below.
    rc = main([
        "train", "--model", "mobilenet_gru", "--num-classes",
        str(num_glosses),
        "--set", "width_mult=0.5", "--set", "gru_hidden=32",
        "--index", index, "--videos", videos,
        "--batch", "8", "--steps", "300", "--lr", "2e-3", "--warmup", "10",
        "--log-every", "100", "--ckpt-dir", ckpt_dir, "--ckpt-every", "300",
        "--frames", "4", "--crop", "32",
    ])
    assert rc == 0

    # One continuous session: all six glosses, permuted, 24 frames each,
    # nuisance seeds disjoint from both training (g*1000+c) and val
    # (10000+g*1000+c) draws.
    sequence = [2, 0, 4, 1, 5, 3]
    session = str(tmp_path / "session.mp4")
    timeline = write_separable_session(
        session, sequence, num_glosses=num_glosses, frames_per_sign=24,
        size=(96, 96), seed=777,
    )
    assert [g for g, _, _ in timeline] == sequence

    model = api.load_model(
        "mobilenet_gru", checkpoint=ckpt_dir, num_classes=num_glosses,
        width_mult=0.5, gru_hidden=32,
        preprocess=dict(num_frames=4, crop=32, resize_short=37,
                        staging_size=(37, 37)),
    )
    wins = predict_windows(
        model, session, window_frames=12, stride_frames=6, batch_size=8,
    )

    # Majority vote of the windows lying FULLY inside each ground-truth
    # sign span (three per sign at window 12 / stride 6 / span 24; the
    # boundary-straddling windows legitimately see two signs and are
    # excluded — that ambiguity is what merge_windows' min_prob is for).
    votes = []
    for gloss_id, start, end in timeline:
        inside = [w for w in wins
                  if w.start_frame >= start and w.end_frame <= end]
        assert len(inside) == 3, (
            f"expected 3 windows inside sign {start}-{end}, got "
            f"{[(w.start_frame, w.end_frame) for w in inside]}"
        )
        ids, counts = np.unique([w.gloss_id for w in inside],
                                return_counts=True)
        votes.append(int(ids[np.argmax(counts)]))
    assert votes == sequence, (
        f"timeline vote {votes} != signed sequence {sequence}; windows: "
        f"{[(w.start_frame, w.end_frame, w.gloss_id, round(w.prob, 2)) for w in wins]}"
    )

    # The merged segment timeline tiles the video end to end and its
    # confident runs appear in signing order.
    segs = merge_windows(wins, min_prob=0.5)
    assert segs[0].start_frame == 1
    assert segs[-1].end_frame == timeline[-1][2]
    confident = [s.gloss_id for s in segs if s.gloss_id >= 0]
    deduped = [g for i, g in enumerate(confident)
               if i == 0 or g != confident[i - 1]]
    # Every sign long enough to own aligned windows must surface as a
    # confident run, in order (boundary windows may form uncertain runs
    # between them; consecutive-duplicate collapse tolerates a low-prob
    # window splitting one sign's run in two).
    it = iter(deduped)
    assert all(any(g == want for g in it) for want in sequence), (
        f"confident segment order {deduped} does not contain the signed "
        f"sequence {sequence}"
    )
