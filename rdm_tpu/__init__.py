"""rdm_tpu — a TPU-native retrieval-augmented generative modeling framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
CompVis/retrieval-augmented-diffusion-models (NeurIPS 2022, arXiv 2204.11824):

- RDM: a latent diffusion model whose U-Net cross-attends to CLIP image
  embeddings retrieved from an external database.
- RARM: an autoregressive transformer over VQGAN tokens cross-attending to the
  same retrieved neighbors, decoded with a KV cache.
- A sharded, HBM-resident exact k-NN retrieval engine replacing ScaNN.

Everything is functional (params as pytrees), jit-compiled, bf16 on the MXU,
and sharded over a `jax.sharding.Mesh` with `(data, db)` axes.

Top-level API (heavier subsystems import lazily from their modules):

    from rdm_tpu import RDMPipeline, RARMPipeline        # inference
    from rdm_tpu.training.trainer import RDMTrainer       # training
    from rdm_tpu.retrieval import RetrievalEngine, DataPool
"""

__version__ = "0.2.0"

__all__ = [
    "RDMPipeline",
    "RARMPipeline",
]


def __getattr__(name):
    # lazy: keep `import rdm_tpu` light (no jax/flax import cost)
    if name in ("RDMPipeline", "RARMPipeline"):
        from rdm_tpu import pipeline

        return getattr(pipeline, name)
    raise AttributeError(name)
