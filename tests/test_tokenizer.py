"""Tokenizer tests.

Golden test: BertWordPieceTokenizer must produce token ids EQUAL to
transformers.BertTokenizer over the same vocab file (the reference's text
paths run HF tokenizers, train.py:233-268). The vocab is a committed
in-test fixture; transformers is installed in this environment, so equality
is checked against the real implementation, not a port of it.
"""
import numpy as np
import pytest

from xmir_tpu.data import BertWordPieceTokenizer, build_text_tokenizer

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "chest", "x", "-", "ray", "shows", "bilateral", "opacities",
    "consistent", "with", "pneumonia", ",", ".", "no", "pleural", "effusion",
    "cardi", "##ome", "##gal", "##y", "atel", "##ect", "##asis",
    "un", "##remark", "##able", "findings", "lung", "##s", "are", "clear",
    "consolidation", "in", "right", "lower", "lobe", "of", "a", "and",
    "##omen", "##ia", "pneum", "##othorax", "2", "##0", "%", "(", ")",
    "患", "者",
]

SENTENCES = [
    "The chest X-ray shows bilateral opacities consistent with pneumonia.",
    "No pleural effusion. Cardiomegaly and atelectasis.",
    "Unremarkable findings, lungs are clear.",
    "Consolidation in the right lower lobe (20%).",
    "Pneumothorax of the right lung.",
    "  Weird   spacing\tand\ncontrol\x00chars.",
    "Accénted wörds résumé",          # accent stripping
    "患者 chest x-ray",                # CJK chars get split
    "supercalifragilisticexpialidocious",  # -> [UNK]
    "",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    return str(p)


class TestWordPieceGolden:
    def test_ids_equal_transformers(self, vocab_file):
        from transformers import BertTokenizer

        hf = BertTokenizer(vocab_file, do_lower_case=True)
        ours = BertWordPieceTokenizer(vocab_file, max_len=64)
        for s in SENTENCES:
            expected = hf.encode(s, add_special_tokens=True)
            got = ours.encode(s)
            assert got == expected, f"{s!r}: {got} != {expected}"

    def test_tokens_equal_transformers(self, vocab_file):
        from transformers import BertTokenizer

        hf = BertTokenizer(vocab_file, do_lower_case=True)
        ours = BertWordPieceTokenizer(vocab_file)
        for s in SENTENCES:
            assert ours.tokenize(s) == hf.tokenize(s), s

    def test_truncation_matches_transformers(self, vocab_file):
        from transformers import BertTokenizer

        hf = BertTokenizer(vocab_file, do_lower_case=True)
        ours = BertWordPieceTokenizer(vocab_file, max_len=8)
        s = SENTENCES[0]
        expected = hf.encode(s, add_special_tokens=True, truncation=True, max_length=8)
        assert ours.encode(s) == expected


class TestTokenizerInterface:
    def test_batch_call_shapes_and_mask(self, vocab_file):
        tok = BertWordPieceTokenizer(vocab_file, max_len=32)
        ids, mask = tok(["lungs are clear", "no effusion"])
        assert ids.shape == mask.shape and ids.dtype == np.int32
        assert (ids[mask == 0] == tok.pad_id).all()
        assert ids[0, 0] == tok.cls_id

    def test_encode_padded_fixed_length(self, vocab_file):
        tok = BertWordPieceTokenizer(vocab_file, max_len=32)
        ids, mask = tok.encode_padded(["lungs are clear"], 16)
        assert ids.shape == (1, 16)

    def test_factory_dispatch(self, vocab_file):
        from xmir_tpu.data.tokenizer import HashWordTokenizer

        assert isinstance(build_text_tokenizer(vocab_file), BertWordPieceTokenizer)
        assert isinstance(build_text_tokenizer(None), HashWordTokenizer)

    def test_matching_texts_share_ids(self, vocab_file):
        tok = build_text_tokenizer(vocab_file, max_len=16)
        a, _ = tok.encode_padded(["pneumonia"], 8)
        b, _ = tok.encode_padded(["pneumonia"], 8)
        np.testing.assert_array_equal(a, b)
