"""Self-contained train → sample → evaluate gate (eval/micro_gate.py).

The CI tier checks the machinery at toy step counts: the loop runs end
to end through the production trainer/pipeline/eval harness and the
feature space separates the shapes distribution from noise by a wide
margin. The full discriminating run (3000 steps: FID(trained) ≪
FID(random-init)) is scripts/micro_quality_gate.py, too slow for CI —
its measured numbers live in COVERAGE.md.
"""

import numpy as np
import pytest


def test_shapes_and_features_discriminate():
    from rdm_tpu.eval.metrics import evaluate_features
    from rdm_tpu.eval.micro_gate import make_shapes, pixel_stat_features

    real_a = make_shapes(96, size=16, seed=0)
    real_b = make_shapes(96, size=16, seed=1)
    noise = np.random.default_rng(2).uniform(
        -1, 1, real_a.shape).astype(np.float32)
    fa = pixel_stat_features(real_a)
    fb = pixel_stat_features(real_b)
    fn = pixel_stat_features(noise)
    fid_same = evaluate_features(fa, fb)["fid"]
    fid_noise = evaluate_features(fa, fn)["fid"]
    # the gate's feature space must place two draws of the SAME
    # distribution far closer than real-vs-noise
    assert fid_noise > 10 * fid_same, (fid_same, fid_noise)
    # uint8 and float inputs map to the same features
    u8 = ((real_a + 1) * 127.5).astype(np.uint8)
    np.testing.assert_allclose(pixel_stat_features(u8), fa, atol=0.02)


def test_run_gate_mechanics():
    """Toy step counts: the full loop (VQ train → RDM train → pipeline
    sampling → FID/P-R) executes and reports a well-formed record."""
    from rdm_tpu.eval.micro_gate import run_gate

    report = run_gate(n_images=48, size=16, k_nn=2, vq_steps=20,
                      rdm_steps=12, train_batch=8, sample_n=16,
                      ddim_steps=4, guidance=1.0, seed=0)
    for key in ("fid_trained", "fid_random_init", "precision_trained",
                "recall_trained", "vq_recon_mse", "fid_ratio"):
        assert np.isfinite(report[key]), (key, report)
    assert report["fid_trained"] > 0 and report["fid_random_init"] > 0


def test_run_gate_rarm_mechanics():
    """AR-family gate machinery at toy step counts: VQ codes → RARM via
    the production RARMTrainer → RARMPipeline KV-cached sampling →
    FID/P-R record (the discriminating 3000-step run is
    scripts/micro_quality_gate.py --model rarm)."""
    from rdm_tpu.eval.micro_gate import run_gate_rarm

    report = run_gate_rarm(n_images=48, size=16, k_nn=2, vq_steps=20,
                           rarm_steps=10, train_batch=8, sample_n=16,
                           top_k=16, guidance=1.0, seed=0)
    for key in ("fid_trained", "fid_random_init", "precision_trained",
                "recall_trained", "vq_recon_mse", "fid_ratio"):
        assert np.isfinite(report[key]), (key, report)
    assert report["fid_trained"] > 0 and report["fid_random_init"] > 0
