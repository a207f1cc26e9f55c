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
"""

__version__ = "0.1.0"
