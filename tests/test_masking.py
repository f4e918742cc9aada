"""UnifiedMasking semantics tests against the reference behavior
(reference: egom2p/data/masking.py)."""
import numpy as np
import pytest

from egom2p_tpu.masking import UnifiedMasking, TransferMasking
from tests.test_model import MODALITY_INFO  # tiny registry

MODS = ("tok_rgb", "tok_depth", "tok_cam", "tok_gaze")


def make_info():
    info = {m: dict(MODALITY_INFO[m]) for m in MODS}
    for m in MODS:
        info[m]["input_alphas"] = [0.01, 0.1, 1.0, 10.0]
        info[m]["target_alphas"] = [0.01, 0.1, 1.0, 10.0]
    return info


def raw_mod_dict(rng):
    return {m: rng.integers(0, MODALITY_INFO[m]["vocab_size"],
                            size=MODALITY_INFO[m]["max_tokens"]).astype(np.int32)
            for m in MODS}


def test_budgets_sum_and_shapes():
    info = make_info()
    masking = UnifiedMasking(info, input_tokens_range=32, target_tokens_range=32,
                             sampling_weights=[1, 1, 1, 1], seed=0)
    rng = np.random.default_rng(0)
    totals_in, totals_tgt = [], []
    for _ in range(20):
        out = masking(raw_mod_dict(rng))
        total_in = sum(int((~out[m]["input_mask"]).sum()) for m in MODS)
        total_tgt = sum(int((~out[m]["target_mask"]).sum()) for m in MODS)
        # budgets can be clamped below the requested totals by max_tokens —
        # but never to zero: a masker that allocates nothing is broken
        assert 1 <= total_in <= 32
        assert 1 <= total_tgt <= 32
        totals_in.append(total_in)
        totals_tgt.append(total_tgt)
        for m in MODS:
            L = MODALITY_INFO[m]["max_tokens"]
            assert out[m]["tensor"].shape == (L,)
            assert out[m]["input_mask"].shape == (L,)
            assert out[m]["decoder_attention_mask"].dtype == np.int32
    # the full budget must actually be reachable (clamping is the exception,
    # not the rule): regression guard against systematic under-allocation
    assert max(totals_in) == 32
    assert max(totals_tgt) == 32


def test_cumsum_attention_encoding():
    """First unmasked target position must carry the target budget
    (reference: masking.py:262-264)."""
    info = make_info()
    masking = UnifiedMasking(info, input_tokens_range=24, target_tokens_range=24,
                             seed=1)
    rng = np.random.default_rng(1)
    out = masking(raw_mod_dict(rng))
    for m in MODS:
        tm = out[m]["target_mask"]
        attn = out[m]["decoder_attention_mask"]
        n_target = int((~tm).sum())
        if n_target == 0:
            assert (attn == 0).all()
        else:
            first = int(np.where(~tm)[0][0])
            assert attn[first] == n_target
            assert attn.sum() == n_target


def test_input_target_disjoint():
    """For image-type modalities input and target positions never overlap."""
    info = make_info()
    masking = UnifiedMasking(info, input_tokens_range=32, target_tokens_range=32,
                             seed=2)
    rng = np.random.default_rng(2)
    for _ in range(10):
        out = masking(raw_mod_dict(rng))
        for m in MODS:
            both = (~out[m]["input_mask"]) & (~out[m]["target_mask"])
            assert not both.any()


def test_transfer_masking():
    info = make_info()
    tm = TransferMasking(info, None, input_modalities=["tok_rgb"],
                         target_modalities=["tok_depth", "tok_cam", "tok_gaze"])
    rng = np.random.default_rng(0)
    out = tm(raw_mod_dict(rng))
    assert not out["tok_rgb"]["input_mask"].any()
    assert out["tok_rgb"]["target_mask"].all()
    assert out["tok_depth"]["input_mask"].all()
    assert not out["tok_depth"]["target_mask"].any()
    L = MODALITY_INFO["tok_depth"]["max_tokens"]
    assert out["tok_depth"]["decoder_attention_mask"][0] == L


def test_requires_tokenizer_for_seq():
    info = make_info()
    info["caption"] = {"type": "seq", "max_tokens": 16, "min_tokens": 0,
                      "input_alphas": [1.0], "target_alphas": [1.0],
                      "vocab_size": 100}
    for m in MODS:
        info[m]["input_alphas"] = [1.0]
        info[m]["target_alphas"] = [1.0]
    with pytest.raises(AssertionError):
        UnifiedMasking(info, None, 32, 32)


def test_transfer_masking_sequence_modalities():
    """TransferMasking must handle seq modalities like the reference
    (masking.py:644-744): inputs fully visible, targets fully span-masked."""
    import numpy as np

    from egom2p_tpu.masking.unified import TransferMasking

    class _FakeTok:
        def get_vocab(self):
            v = {f"[S_{i}]": 10 + i for i in range(10)}
            v.update({"[PAD]": 0, "[EOS]": 3})
            return v

        def token_to_id(self, t):
            return self.get_vocab()[t]

        class _Enc:
            def __init__(self, ids):
                self.ids = ids

        def encode(self, s):
            return self._Enc([30 + (ord(c) % 20) for c in s])

    info = {
        "tok_cam": {"type": "cam", "max_tokens": 8, "min_tokens": 0},
        "caption": {"type": "seq", "max_tokens": 6, "min_tokens": 0},
    }
    tm = TransferMasking(info, _FakeTok(), input_modalities=["caption"],
                         target_modalities=["tok_cam"])
    out = tm({"caption": "abc", "tok_cam": np.arange(8)})
    cap = out["caption"]
    L = (6 + 1) * 2
    assert cap["tensor"].shape == (L,)
    # input: the whole (truncated) sequence is visible
    n_in = int((~cap["input_mask"]).sum())
    assert n_in >= 4  # 3 chars + EOS
    assert (~cap["target_mask"]).sum() >= 1  # sentinel-only target side
    cam = out["tok_cam"]
    assert cam["input_mask"].all() and not cam["target_mask"].any()

    # target sequence direction
    tm2 = TransferMasking(info, _FakeTok(), input_modalities=["tok_cam"],
                          target_modalities=["caption"])
    out2 = tm2({"caption": "abc", "tok_cam": np.arange(8)})
    cap2 = out2["caption"]
    assert cap2["input_mask"].all()  # nothing visible as input
    assert (~cap2["target_mask"]).sum() >= 4
