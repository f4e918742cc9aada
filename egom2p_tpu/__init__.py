"""EgoM2P-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
lgen-sudo/EgoM2P (ICCV 2025, arXiv 2506.07886).

This is a from-scratch rebuild designed for TPU hardware:
  * the 400M masked multimodal multitask encoder-decoder transformer
    (reference: egom2p/models/egom2p_model.py) as a flax.linen model with
    fixed-shape mask-gather batching, bf16 MXU compute and pjit sharding,
  * the Cosmos DV4x8x8 causal-3D-CNN + FSQ video tokenizer
    (reference: cosmos_tokenizer/) in pure JAX with XLA convolutions,
  * the camera-trajectory / gaze transformer VQ-VAEs (reference: egom2p/vq/)
    with functional EMA codebook state and psum codebook sync,
  * iterative-unmasking (ROAR / MaskGIT) and autoregressive generation with
    classifier-free guidance (reference: egom2p/models/generate.py),
  * the Dirichlet-budget unified masking data pipeline (reference: egom2p/data/).
"""

__version__ = "0.1.0"
