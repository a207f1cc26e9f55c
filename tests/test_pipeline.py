"""Pipeline tests: model-dir loading (reference YAML + random init),
unconditional / query sampling surfaces, RARM pipeline decode.
"""

import os
import pickle
import textwrap

import numpy as np
import pytest

RDM_YAML = textwrap.dedent("""
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

RARM_YAML = textwrap.dedent("""
model:
  target: rdm.models.autoregression.transformer.LatentImageRETRO
  params:
    mask_token: 32
    sos_token: 33
    transformer_config:
      params:
        in_channels: 34
        n_heads: 2
        d_head: 8
        depth: 1
        context_dim: 24
        sequence_length: 16
        out_channels: 32
        causal: true
        continuous: false
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
          ch_mult: [1, 2, 4]
          num_res_blocks: 1
          attn_resolutions: []
""")


@pytest.fixture
def model_dirs(tmp_path):
    rdm_dir = tmp_path / "rdm"
    rarm_dir = tmp_path / "rarm"
    db_dir = tmp_path / "db"
    for d in (rdm_dir, rarm_dir, db_dir):
        d.mkdir()
    (rdm_dir / "config.yaml").write_text(RDM_YAML)
    (rarm_dir / "config.yaml").write_text(RARM_YAML)
    emb = np.random.default_rng(0).standard_normal(
        (400, 24)).astype(np.float32)
    np.savez(db_dir / "part0.npz", embedding=emb,
             img_id=np.arange(400),
             patch_coords=np.zeros((400, 4), int))
    mem = tmp_path / "mem.p"
    ids, counts = np.unique(
        np.random.default_rng(1).integers(0, 400, 300),
        return_counts=True)
    with open(mem, "wb") as f:
        pickle.dump({"nn_memory": ids[np.argsort(-counts)],
                     "id_count": {int(i): int(c)
                                  for i, c in zip(ids, counts)}}, f)
    return str(rdm_dir), str(rarm_dir), str(db_dir), str(mem)


def test_rdm_pipeline_unconditional(model_dirs):
    from rdm_tpu.pipeline import RDMPipeline

    rdm_dir, _, db, mem = model_dirs
    pipe = RDMPipeline.from_model_dir(rdm_dir, database=db, nn_memory=mem,
                                      random_init=True)
    logs = pipe.sample_unconditional(2, steps=4, guidance_scale=2.0,
                                     seed=0, return_nns=True)
    imgs = logs["samples_with_sampled_nns"]
    assert imgs.shape == (2, 16, 16, 3) and imgs.dtype == np.uint8
    assert logs["nn_embeddings"].shape == (2, 3, 24)
    # reproducible
    logs2 = pipe.sample_unconditional(2, steps=4, guidance_scale=2.0,
                                      seed=0)
    np.testing.assert_array_equal(imgs,
                                  logs2["samples_with_sampled_nns"])


def test_rdm_pipeline_query_modes(model_dirs):
    from rdm_tpu.pipeline import RDMPipeline

    rdm_dir, _, db, mem = model_dirs
    pipe = RDMPipeline.from_model_dir(rdm_dir, database=db, nn_memory=mem,
                                      random_init=True)
    q = np.random.default_rng(2).standard_normal((2, 24)).astype(
        np.float32)
    a = pipe.sample_with_query(q, steps=3, seed=0)["query_samples"]
    b = pipe.sample_with_query(q, steps=3, seed=0,
                               omit_query=True)["query_samples"]
    c = pipe.sample_with_query(q, steps=3, seed=0,
                               only_query=True)["query_samples"]
    # at random init the zero-init out-conv makes eps identical across
    # conditionings, so only the shape contracts are checked here; the
    # conditioning-sensitivity property is covered by
    # tests/test_rdm.py::test_cfg_guidance_changes_sample
    assert a.shape == b.shape == c.shape == (2, 16, 16, 3)


def test_rarm_pipeline_unconditional(model_dirs):
    from rdm_tpu.pipeline import RARMPipeline

    _, rarm_dir, db, mem = model_dirs
    pipe = RARMPipeline.from_model_dir(rarm_dir, database=db,
                                       nn_memory=mem, random_init=True)
    logs = pipe.sample_unconditional(2, k_nn=3, top_k=16, seed=0)
    imgs = logs["samples_with_sampled_nns"]
    # 16 tokens -> 4x4 grid -> f4 decode -> 16x16 images
    assert imgs.shape == (2, 16, 16, 3) and imgs.dtype == np.uint8


def test_rdm_pipeline_inpaint(model_dirs):
    from rdm_tpu.pipeline import RDMPipeline

    rdm_dir, _, db, mem = model_dirs
    pipe = RDMPipeline.from_model_dir(rdm_dir, database=db, nn_memory=mem,
                                      random_init=True)
    imgs = np.random.default_rng(0).uniform(
        -1, 1, (2, 16, 16, 3)).astype(np.float32)
    mask = np.ones((2, 8, 8, 1), dtype=np.float32)  # keep everything
    nns = np.random.default_rng(1).standard_normal(
        (2, 3, 24)).astype(np.float32)
    out = pipe.sample_inpaint(imgs, mask, neighbors=nns, steps=4, seed=0)
    assert out["inpaint_samples"].shape == (2, 16, 16, 3)
    assert out["inpaint_samples"].dtype == np.uint8


def test_params_npz_roundtrip_and_pipeline_load(model_dirs, tmp_path):
    """save_params_npz/load_params_npz roundtrip + from_model_dir's
    torch-free npz loading path."""
    import jax

    from rdm_tpu.pipeline import RDMPipeline
    from rdm_tpu.utils.params_io import load_params_npz, save_params_npz

    rdm_dir, _, db, mem = model_dirs
    pipe = RDMPipeline.from_model_dir(rdm_dir, database=db, nn_memory=mem,
                                      random_init=True, seed=3)
    # persist the (random) params as npz and reload through the pipeline
    save_params_npz(os.path.join(rdm_dir, "params.npz"),
                    jax.device_get(pipe.params))
    save_params_npz(os.path.join(rdm_dir, "first_stage_params.npz"),
                    jax.device_get(pipe.first_stage_params))
    pipe2 = RDMPipeline.from_model_dir(rdm_dir, database=db,
                                       nn_memory=mem)
    a = pipe.sample_unconditional(1, steps=2, guidance_scale=1.0, seed=0)
    b = pipe2.sample_unconditional(1, steps=2, guidance_scale=1.0, seed=0)
    np.testing.assert_array_equal(a["samples_with_sampled_nns"],
                                  b["samples_with_sampled_nns"])
    # direct roundtrip equality
    loaded = load_params_npz(os.path.join(rdm_dir, "params.npz"))
    l0 = jax.tree.leaves(loaded)[0]
    p0 = jax.tree.leaves(jax.device_get(pipe.params))[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(p0))


def test_rdm_pipeline_with_sharded_database(model_dirs):
    """Pipeline with the retrieval table sharded over the db mesh axis."""
    from rdm_tpu.parallel.mesh import make_mesh
    from rdm_tpu.pipeline import RDMPipeline

    rdm_dir, _, db, mem = model_dirs
    mesh = make_mesh(data=1, db=8)
    pipe = RDMPipeline.from_model_dir(rdm_dir, database=db, nn_memory=mem,
                                      random_init=True, mesh=mesh)
    logs = pipe.sample_unconditional(2, steps=3, guidance_scale=1.0,
                                     seed=0, return_nns=True)
    assert logs["samples_with_sampled_nns"].shape == (2, 16, 16, 3)
    # sharded search must agree with the single-device engine
    from rdm_tpu.retrieval.database import DataPool
    from rdm_tpu.retrieval.engine import RetrievalEngine
    import jax.numpy as jnp
    pool = DataPool.load(db)
    single = RetrievalEngine(pool, dtype=jnp.float32)
    q = pool.embeddings[:3]
    a = pipe.retrieval.engine.search(jnp.asarray(q), k=3)
    b = single.search(jnp.asarray(q), k=3)
    np.testing.assert_array_equal(np.asarray(a["nns"]),
                                  np.asarray(b["nns"]))


def test_rdm_pipeline_data_parallel_sampling(model_dirs):
    """mesh with data>1: the DDIM batch shards over the data axis and
    must reproduce the single-device pipeline's samples exactly."""
    from rdm_tpu.parallel.mesh import make_mesh
    from rdm_tpu.pipeline import RDMPipeline

    rdm_dir, _, db, mem = model_dirs
    single = RDMPipeline.from_model_dir(rdm_dir, database=db,
                                        nn_memory=mem, random_init=True)
    mesh = make_mesh(data=4, db=2)
    dp = RDMPipeline.from_model_dir(rdm_dir, database=db, nn_memory=mem,
                                    random_init=True, mesh=mesh)
    q = np.random.default_rng(5).standard_normal((4, 24)).astype(
        np.float32)
    a = single.sample_with_query(q, steps=3, seed=1,
                                 only_query=True)["query_samples"]
    b = dp.sample_with_query(q, steps=3, seed=1,
                             only_query=True)["query_samples"]
    np.testing.assert_array_equal(a, b)
    # indivisible batch -> clear error
    q3 = q[:3]
    with pytest.raises(ValueError, match="not divisible"):
        dp.sample_with_query(q3, steps=3, seed=1, only_query=True)


def test_rarm_pipeline_data_parallel_sampling(model_dirs):
    from rdm_tpu.parallel.mesh import make_mesh
    from rdm_tpu.pipeline import RARMPipeline

    _, rarm_dir, db, mem = model_dirs
    single = RARMPipeline.from_model_dir(rarm_dir, database=db,
                                         nn_memory=mem, random_init=True)
    mesh = make_mesh(data=8, db=1)
    dp = RARMPipeline.from_model_dir(rarm_dir, database=db, nn_memory=mem,
                                     random_init=True, mesh=mesh)
    q = np.random.default_rng(6).standard_normal((8, 24)).astype(
        np.float32)
    a = single.sample_with_query(q, top_k=8, seed=2,
                                 only_query=True)["query_samples"]
    b = dp.sample_with_query(q, top_k=8, seed=2,
                             only_query=True)["query_samples"]
    np.testing.assert_array_equal(a, b)
