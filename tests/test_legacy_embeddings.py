"""Legacy embedding families end-to-end: raw-pixel and sequence-embedding
input modalities through masking and the full model (verdict item 6)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_sequence_emb_mask_span():
    from egom2p_tpu.masking.span import get_sentinel_to_id_mapping
    from egom2p_tpu.masking.unified import UnifiedMasking

    class FakeTok:
        """Minimal sentinel vocabulary for the span machinery."""

        def token_to_id(self, t):
            if t == "[PAD]":
                return 0
            if t == "[EOS]":
                return 1
            if t.startswith("[S_"):
                return 100 + int(t[3:-1])
            return None

        def get_vocab(self):
            return {f"[S_{i}]": 100 + i for i in range(10)}

    from egom2p_tpu.data.modality_info import MODALITY_INFO
    info = {"t5_caption": dict(MODALITY_INFO["t5_caption"],
                               input_alphas=[1.0], target_alphas=[1.0])}
    masking = UnifiedMasking(info, FakeTok(), input_tokens_range=32,
                             target_tokens_range=32, seed=0)
    emb = np.random.default_rng(0).normal(0, 1, (20, 48)).astype(np.float32)
    out = masking({"t5_caption": emb})["t5_caption"]
    assert out["tensor"].shape == (77, 48)
    assert out["input_mask"].shape == (77,)
    # input-only: target mask stays fully masked
    assert out["target_mask"].all()
    n_in = (~out["input_mask"]).sum()
    assert 0 < n_in <= 32


@pytest.mark.slow
def test_legacy_mod_dict_through_model():
    """rgb@224 raw pixels + t5_caption embeddings as inputs, tok_cam as the
    target: init + forward loss on the full EgoM2P module."""
    from egom2p_tpu.data.modality_info import MODALITY_INFO
    from egom2p_tpu.models.egom2p import create_model

    in_domains = ("rgb@224", "t5_caption", "tok_cam")
    out_domains = ("tok_cam",)
    info = {m: dict(MODALITY_INFO[m]) for m in in_domains}
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias",
                         in_domains, out_domains, modality_info=info,
                         dim=64, encoder_depth=2, decoder_depth=2, num_heads=4)
    rng = np.random.default_rng(0)
    B = 2
    md = {
        "rgb@224": {
            "tensor": jnp.asarray(rng.normal(0, 1, (B, 224, 224, 3))
                                  .astype(np.float32)),
            "input_mask": jnp.zeros((B, 196), bool),
            "target_mask": jnp.ones((B, 196), bool),
            "decoder_attention_mask": jnp.zeros((B, 196), jnp.int32),
        },
        "t5_caption": {
            "tensor": jnp.asarray(rng.normal(0, 1, (B, 77, 4096))
                                  .astype(np.float32)),
            "input_mask": jnp.asarray(np.arange(77)[None].repeat(B, 0) >= 10),
            "target_mask": jnp.ones((B, 77), bool),
            "decoder_attention_mask": jnp.zeros((B, 77), jnp.int32),
        },
        "tok_cam": {
            "tensor": jnp.asarray(rng.integers(0, 256, (B, 30))
                                  .astype(np.int32)),
            "input_mask": jnp.ones((B, 30), bool),
            "target_mask": jnp.zeros((B, 30), bool),
            "decoder_attention_mask": jnp.asarray(
                np.where(np.arange(30)[None].repeat(B, 0) == 0, 30, 0)
                .astype(np.int32)),
        },
    }
    params = model.init(jax.random.PRNGKey(0), md, 64, 30)
    loss, mod_loss = model.apply(params, md, 64, 30, "mod",
                                 compute_dtype=jnp.float32)
    assert np.isfinite(float(loss))
    assert set(mod_loss) == {"tok_cam"}
    # untrained CE ~ ln(256)
    assert abs(float(mod_loss["tok_cam"]) - np.log(256)) < 1.0
