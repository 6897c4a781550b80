"""SPM tokenizer: greedy merges, byte fallback, GGUF metadata round trip."""

import numpy as np
import pytest

from ggml_cuda_experiments_tpu.utils.tokenizer import SpmTokenizer


def _toy():
    """Tiny SentencePiece-like vocab: merges prefer higher scores."""
    tokens = ["<unk>", "<s>", "</s>"]
    types = [2, 3, 3]
    scores = [0.0, 0.0, 0.0]
    for b in range(256):                      # byte fallback plane
        tokens.append(f"<0x{b:02X}>")
        types.append(6)
        scores.append(0.0)
    pieces = {
        "▁": -2.0, "h": -3.0, "e": -3.0, "l": -3.0, "o": -3.0,
        "he": -1.0, "ll": -1.5, "hell": -0.5, "hello": -0.1,
        "▁hello": -0.05, "▁w": -1.2, "or": -1.3, "ld": -1.4,
        "orld": -0.8, "world": -0.6, "▁world": -0.3,
        "w": -3.0, "r": -3.0, "d": -3.0,
    }
    for p, s in pieces.items():
        tokens.append(p)
        types.append(1)
        scores.append(s)
    return SpmTokenizer(tokens=tokens, scores=scores, token_type=types,
                        bos_id=1, eos_id=2, unk_id=0)


def test_encode_merges_to_words():
    tok = _toy()
    ids = tok.encode("hello world")
    assert ids[0] == tok.bos_id
    pieces = [tok.tokens[i] for i in ids[1:]]
    assert pieces == ["▁hello", "▁world"]


def test_roundtrip():
    tok = _toy()
    for text in ["hello world", "hello", "world hello hello"]:
        assert tok.decode(tok.encode(text)) == text


def test_byte_fallback_roundtrip():
    tok = _toy()
    text = "hello zebra!"                    # z/b/a/! not in vocab pieces
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    # unknown chars became byte tokens
    assert any(tok.token_type[i] == 6 for i in ids)


def test_from_gguf_metadata(tmp_path, rng):
    from ggml_cuda_experiments_tpu.utils import gguf

    toy = _toy()
    path = str(tmp_path / "tok.gguf")
    gguf.write_gguf(path, {"dummy": np.zeros((4,), np.float32)}, {
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": toy.tokens,
        "tokenizer.ggml.scores": toy.scores,
        "tokenizer.ggml.token_type": toy.token_type,
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    })
    from ggml_cuda_experiments_tpu.utils.tokenizer import load_tokenizer
    tok2 = load_tokenizer(path)
    assert tok2.vocab_size == toy.vocab_size
    assert tok2.decode(tok2.encode("hello world")) == "hello world"
