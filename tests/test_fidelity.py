"""Fidelity harness (eval/fidelity.py + RDMPipeline.fidelity_run):
approximate serving modes measured against the exact bf16 sampler on
identical seeds — the data behind scripts/quality_eval.py and the
recorded COVERAGE envelopes.
"""

import pickle
import textwrap

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_psnr_and_cosine_helpers():
    from rdm_tpu.eval.fidelity import cosine, per_step_cosine, psnr

    a = np.ones((2, 4, 4), np.float32)
    assert psnr(a, a, 1.0) == float("inf")
    b = a + 0.1
    # mse = 0.01 over range 1 → 20 dB
    assert psnr(a, b, 1.0) == pytest.approx(20.0, abs=0.01)
    assert cosine(a, a) == pytest.approx(1.0)
    traj = np.stack([a, b])
    sc = per_step_cosine(traj, traj)
    assert sc.shape == (2,) and np.allclose(sc, 1.0)


@pytest.fixture(scope="module")
def tiny_pipe(tmp_path_factory):
    from rdm_tpu.pipeline import RDMPipeline

    tmp_path = tmp_path_factory.mktemp("fid")
    yaml = textwrap.dedent("""
    model:
      target: rdm.models.diffusion.ddpm.MinimalRETRODiffusion
      params:
        k_nn: 3
        timesteps: 50
        image_size: 8
        channels: 3
        unet_config:
          params:
            in_channels: 3
            out_channels: 3
            model_channels: 16
            attention_resolutions: [2]
            num_res_blocks: 1
            channel_mult: [1, 2]
            num_head_channels: 8
            context_dim: 24
        first_stage_config:
          params:
            embed_dim: 3
            n_embed: 32
            ddconfig:
              z_channels: 3
              resolution: 16
              in_channels: 3
              out_ch: 3
              ch: 8
              ch_mult: [1, 2]
              num_res_blocks: 1
              attn_resolutions: []
    """)
    mdir = tmp_path / "rdm"
    db = tmp_path / "db"
    mdir.mkdir()
    db.mkdir()
    (mdir / "config.yaml").write_text(yaml)
    emb = np.random.default_rng(0).standard_normal(
        (64, 24)).astype(np.float32)
    np.savez(db / "part0.npz", embedding=emb, img_id=np.arange(64),
             patch_coords=np.zeros((64, 4), int))
    pipe = RDMPipeline.from_model_dir(str(mdir), database=str(db),
                                      random_init=True)
    # the eps head is zero-init at random init, which makes every
    # serving mode trivially bit-identical — randomize it so the
    # comparisons below actually discriminate
    out_conv = pipe.params["params"]["unet"]["out_conv"]
    out_conv["kernel"] = (jax.random.normal(
        jax.random.PRNGKey(9), out_conv["kernel"].shape) * 0.05).astype(
        out_conv["kernel"].dtype)
    found = pipe.retrieval.engine.search(
        jnp.asarray(emb[:2]), k=3)
    neighbors = np.asarray(found["embeddings"], np.float32)
    return pipe, neighbors


def test_fidelity_exact_self_agreement(tiny_pipe):
    from rdm_tpu.eval.fidelity import compare_runs

    pipe, neighbors = tiny_pipe
    a = pipe.fidelity_run(neighbors, steps=4, seed=0)
    b = pipe.fidelity_run(neighbors, steps=4, seed=0)
    # one pred_x0 per executed ladder step (the DDIM ladder may round up)
    assert a["traj"].shape[0] >= 4
    assert a["traj"].shape[1:] == a["z"].shape
    rec = compare_runs(a, b)
    assert rec["latent_psnr_db"] == float("inf")
    assert rec["pred_x0_cosine_min"] == 1.0
    # a different seed is a genuinely different sample
    c = pipe.fidelity_run(neighbors, steps=4, seed=1)
    assert not np.array_equal(a["z"], c["z"])


def test_fidelity_encoder_reuse_envelope(tiny_pipe):
    from rdm_tpu.eval.fidelity import compare_runs

    pipe, neighbors = tiny_pipe
    exact = pipe.fidelity_run(neighbors, steps=8, seed=0)
    reuse2 = pipe.fidelity_run(neighbors, steps=8, seed=0,
                               encoder_reuse=2)
    rec = compare_runs(exact, reuse2)
    # approximate but anchored to the same noise draw: high agreement,
    # not bit-identity
    assert rec["latent_cosine"] > 0.98
    assert rec["pred_x0_cosine_min"] > 0.95
    assert np.isfinite(rec["latent_psnr_db"])
    # reuse=1 through the same code path IS the exact sampler
    reuse1 = pipe.fidelity_run(neighbors, steps=8, seed=0,
                               encoder_reuse=1)
    np.testing.assert_array_equal(exact["z"], reuse1["z"])


def test_fidelity_int8_envelope(tiny_pipe):
    from rdm_tpu.eval.fidelity import compare_runs
    from rdm_tpu.ops.quant import num_quantized

    pipe, neighbors = tiny_pipe
    exact = pipe.fidelity_run(neighbors, steps=4, seed=0)
    q = pipe.fidelity_run(neighbors, steps=4, seed=0, int8=True)
    assert num_quantized(pipe._params_int8) > 0
    rec = compare_runs(exact, q)
    assert rec["pred_x0_cosine_min"] > 0.95
    assert rec["latent_cosine"] > 0.95
    assert rec["image_psnr_db"] > 20.0
    # the modes compose: int8 + encoder-reuse in one run
    combo = pipe.fidelity_run(neighbors, steps=4, seed=0, int8=True,
                              encoder_reuse=2)
    rec2 = compare_runs(exact, combo)
    assert rec2["latent_cosine"] > 0.9
    assert np.isfinite(rec2["image_psnr_db"])
