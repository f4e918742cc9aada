"""Native WordPiece tokenizer parity vs the HF Rust `tokenizers` package
(reference: egom2p/utils/tokenizer/text_tokenizer.py)."""
import numpy as np
import pytest

tokenizers = pytest.importorskip("tokenizers")

from egom2p_tpu.utils.text_tokenizer import (WordPieceTokenizer,
                                             generate_coord_tokens,
                                             generate_sentinel_tokens,
                                             train_unified_wordpiece_tokenizer)

CORPUS = """the quick brown fox jumps over the lazy dog
a man a plan a canal panama
detection boxes live at v0=12 v1=34 v2=500 v3=999
multimodal egocentric video pretraining with masked modeling
punctuation, weird-cases: don't stop; (parentheses) [brackets]!
UPPER lower MixedCase numbers 123 4567
"""


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    corpus = d / "corpus.txt"
    corpus.write_text(CORPUS * 20)
    tok = train_unified_wordpiece_tokenizer(
        str(corpus), vocab_size=400,
        sentinel_tokens=generate_sentinel_tokens(10),
        coord_tokens=generate_coord_tokens(50),
        show_progress=False)
    path = str(d / "tokenizer.json")
    tok.save(path)
    return tok, path


def test_native_reader_matches_hf_encode(trained):
    hf, path = trained
    native = WordPieceTokenizer.from_file(path)
    assert native.get_vocab() == hf.get_vocab()
    cases = [
        "the quick brown fox",
        "a plan; a canal: panama!",
        "[S_0] masked span [S_1] another",
        "boxes v0=12 v1=34 v2=41 v3=9 dog",
        "don't stop, won't stop",
        "UNKNOWNWORDXYZQQQ and the rest",
        "MiXeD CaSe 123",
    ]
    for text in cases:
        assert native.encode(text).ids == hf.encode(text).ids, text


def test_native_reader_special_token_surface(trained):
    _, path = trained
    native = WordPieceTokenizer.from_file(path)
    assert native.token_to_id("[PAD]") is not None
    assert native.token_to_id("[EOS]") is not None
    assert native.token_to_id("[S_3]") is not None
    ids = native.encode("the fox [S_2] dog").ids
    assert native.token_to_id("[S_2]") in ids
    # round trip drops special tokens
    text = native.decode(ids)
    assert "[S_2]" not in text and "fox" in text


def test_native_reader_drives_unified_masking(trained):
    """The native tokenizer satisfies UnifiedMasking's interface."""
    _, path = trained
    from egom2p_tpu.data.modality_info import MODALITY_INFO
    from egom2p_tpu.masking.unified import UnifiedMasking
    native = WordPieceTokenizer.from_file(path)
    info = {m: dict(MODALITY_INFO[m]) for m in ("tok_rgb", "caption")}
    for m in info:
        info[m]["input_alphas"] = [1.0]
        info[m]["target_alphas"] = [1.0]
    masking = UnifiedMasking(info, text_tokenizer=native,
                             input_tokens_range=(24, 24),
                             target_tokens_range=(24, 24), seed=0)
    L = MODALITY_INFO["tok_rgb"]["max_tokens"]
    sample = {
        "tok_rgb": np.zeros(L, np.int64),
        "caption": "the quick brown fox jumps",
    }
    out = masking(sample)
    assert "caption" in out and "tensor" in out["caption"]
    assert out["caption"]["tensor"].dtype.kind in "iu"


def test_generation_datasets(tmp_path, trained):
    """EmptyDataset / ImageCaptionDataset / PartiPromptsDataset
    (reference: egom2p/utils/generation_datasets/)."""
    from PIL import Image

    from egom2p_tpu.data.generation_datasets import (EmptyDataset,
                                                     ImageCaptionDataset,
                                                     PartiPromptsDataset)
    from egom2p_tpu.data.modality_transforms import CenterCropImageAugmenter

    empty = EmptyDataset(5)
    assert len(empty) == 5 and empty[3] == {}

    # aligned rgb/ + caption/ folders
    (tmp_path / "rgb").mkdir()
    (tmp_path / "caption").mkdir()
    rs = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rs.randint(0, 255, (40, 48, 3), np.uint8)).save(
            tmp_path / "rgb" / f"s{i}.png")
        (tmp_path / "caption" / f"s{i}.txt").write_text(f"caption {i}")
    ds = ImageCaptionDataset(str(tmp_path),
                             augmenter=CenterCropImageAugmenter(
                                 32, main_domain="rgb"))
    assert len(ds) == 3
    s = ds[1]
    assert s["rgb"].shape == (32, 32, 3) and s["caption"] == "caption 1"

    # parti prompts tsv
    _, tok_path = trained
    from egom2p_tpu.utils.text_tokenizer import WordPieceTokenizer
    tok = WordPieceTokenizer.from_file(tok_path)
    tsv = tmp_path / "PartiPrompts.tsv"
    tsv.write_text("Prompt\tCategory\nthe quick brown fox\tAnimals\n"
                   "a canal in panama\tWorld\n")
    pp = PartiPromptsDataset(tok, max_length=16, parti_prompts_tsv=str(tsv))
    assert len(pp) == 2
    item = pp[0]["caption"]["tensor"]
    assert item.shape == (16,)
    assert item[0] != tok.token_to_id("[PAD]")
    assert tok.token_to_id("[EOS]") in item.tolist()
    with pytest.raises(FileNotFoundError, match="egress"):
        PartiPromptsDataset(tok, parti_prompts_tsv=str(tmp_path / "nope.tsv"))
