"""Evaluation metric tests: FID analytic cases, precision/recall
sanity on controlled distributions."""

import numpy as np

from rdm_tpu.eval.metrics import (
    evaluate_features,
    fid_from_features,
    frechet_distance,
    gaussian_stats,
    precision_recall,
)


def test_fid_identical_distributions_is_zero():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2000, 8))
    mu, cov = gaussian_stats(x)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-8


def test_fid_mean_shift_analytic():
    """Equal covariances → FID == ||mu1 - mu2||^2 exactly."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((5000, 4))
    shift = np.array([2.0, 0.0, 0.0, 0.0])
    mu, cov = gaussian_stats(x)
    d = frechet_distance(mu, cov, mu + shift, cov)
    np.testing.assert_allclose(d, 4.0, rtol=1e-6)


def test_fid_scale_sensitivity():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((4000, 6))
    b = 3.0 * rng.standard_normal((4000, 6))
    assert fid_from_features(a, b) > 1.0
    assert fid_from_features(a, a[:2000]) < 0.1


def test_precision_recall_extremes():
    rng = np.random.default_rng(3)
    real = rng.standard_normal((500, 8))
    # generated == subset of real → both near 1
    p, r = precision_recall(real, real[:250] + 1e-6, nhood_size=3)
    assert p > 0.95 and r > 0.9
    # generated far away → both near 0
    p2, r2 = precision_recall(real, real[:250] + 100.0, nhood_size=3)
    assert p2 < 0.05 and r2 < 0.05


def test_precision_recall_mode_collapse():
    """High precision, low recall when generator collapses to one mode."""
    rng = np.random.default_rng(4)
    real = rng.standard_normal((800, 8))
    collapsed = real[0] + 0.01 * rng.standard_normal((400, 8))
    p, r = precision_recall(real, collapsed, nhood_size=3)
    assert p > 0.8
    assert r < 0.2


def test_evaluate_features_dict():
    rng = np.random.default_rng(5)
    out = evaluate_features(rng.standard_normal((300, 4)),
                            rng.standard_normal((200, 4)))
    assert set(out) >= {"fid", "precision", "recall"}
    assert out["n_real"] == 300 and out["n_generated"] == 200


def test_evaluate_cli_end_to_end(tmp_path):
    # full CLI path: two PNG dirs -> features -> FID/P/R JSON, via the
    # --embedder escape hatch (a 48-d mean/std pooling embedder)
    import json
    import os
    import subprocess
    import sys

    from PIL import Image

    rng = np.random.default_rng(0)
    for d in ("real", "gen"):
        (tmp_path / d).mkdir()
        for i in range(6):
            Image.fromarray(rng.integers(0, 255, (40, 40, 3),
                                         dtype=np.uint8)).save(
                tmp_path / d / f"{i}.png")
    emb = tmp_path / "toy_embedder.py"
    emb.write_text(
        "import numpy as np\n"
        "def embed(batch):\n"
        "    x = np.asarray(batch, np.float32).reshape(len(batch), -1)\n"
        "    k = x.shape[1] // 24\n"
        "    x = x[:, :24 * k].reshape(len(batch), 24, -1)\n"
        "    return np.concatenate([x.mean(-1), x.std(-1)], axis=1)\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "evaluate.py"),
         "--real", str(tmp_path / "real"),
         "--generated", str(tmp_path / "gen"),
         "--embedder", "toy_embedder:embed", "--size", "32",
         "--nhood", "2", "--batch_size", "4",
         "--out", str(tmp_path / "m.json")],
        env={**os.environ, "PYTHONPATH": f"{str(tmp_path)}:{repo}",
             "JAX_PLATFORMS": "cpu"},
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    metrics = json.loads((tmp_path / "m.json").read_text())
    assert {"fid", "precision", "recall"} <= set(metrics)
    assert all(np.isfinite(v) for v in metrics.values())
