"""End-to-end accuracy gate: train on synthetic scenes -> the REAL eval CLI
(test.py) -> pose AUC (round-4 verdict item #1 + Missing #4).

Unlike test_overfit.py (single-pair match correctness), this exercises the
whole production stack on UNSEEN data: MegaDepth-format dataset on disk ->
DataLoader -> Trainer -> orbax checkpoint -> `test.py` subprocess
(matcher -> epipolar errors -> RANSAC pose -> aggregate_metrics) — and
gates that training moves the benchmark metric, with the strongest
committed evidence in perf/synthetic_auc.json (63 held-out
pairs, 2000 steps trained on the chip at 256px: untrained auc@{5,10,20}
= 0.0 -> trained 0.26/0.49/0.69, prec@1e-4 0.96).  Run-to-run noise on
that flagship config is pinned by perf/seed_sweep.json (3 seeds:
auc@10 0.459+/-0.026, auc@20 0.676+/-0.010, prec 0.972+/-0.011 — the
committed artifact sits at the top of its band).

This test runs a shortened version (fewer steps/scenes) with
correspondingly conservative gates; ~6 min on an 8-core CPU box.
"""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
def test_train_then_real_eval_cli_improves_pose_auc(tmp_path):
    from tools.synthetic_benchmark import (evaluate_cli, generate_data,
                                           train)

    work = str(tmp_path)
    train_npzs, test_idx = generate_data(
        work, n_train_scenes=2, n_test_scenes=2, views=8, img_size=256,
        seed=0, baseline=0.6)

    ckpt, losses = train(work, train_npzs, img_size=256, img_resize=128,
                         steps=250, batch_size=4, lr=2e-3, seed=0)
    # training must actually converge
    assert np.mean(losses[-20:]) < 0.25 * np.mean(losses[:20]), \
        (np.mean(losses[:20]), np.mean(losses[-20:]))

    # the PRODUCTION eval CLI end to end (subprocess; JSON on stdout)
    agg = evaluate_cli(work, test_idx, ckpt, img_resize=128,
                       pose_solver="opencv",
                       extra_env={"JAX_PLATFORMS": "cpu"})
    print("eval:", json.dumps(agg))
    # conservative gates for the shortened run (the committed
    # artifact reaches prec 0.96 / auc@20 0.69; untrained measures 0.0)
    assert agg["prec@1e-04"] > 0.3, agg
    assert agg["auc@20"] > 0.03, agg
    # figures + dump side outputs of the CLI exist
    assert os.path.isfile(os.path.join(work, "eval_dump.npz"))
    figs = os.listdir(os.path.join(work, "figures"))
    assert len(figs) > 0
