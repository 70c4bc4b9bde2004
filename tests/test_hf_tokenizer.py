"""Pure-Python tokenizer.json interpreter vs the Rust `tokenizers` oracle.

Fixtures mirror the STRUCTURE of the four real tokenizers (T5/UMT5 Unigram+
Metaspace+Template, Llama-3 BPE ignore_merges+Split-regex+ByteLevel, CLIP
lowercase+BPE end_of_word_suffix+inverted Split, tiny-checkpoint WordLevel+
Whitespace+added <image>). Real vocab files are not fetchable here (no
egress) — structure, not content, is what these pin. The SentencePiece
Precompiled charsmap is validated against a hand-built darts double-array.
"""

import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.fast

tokenizers = pytest.importorskip("tokenizers")
from tokenizers import AddedToken, Regex, Tokenizer, models, normalizers, pre_tokenizers, processors

from alg_tpu.io.hf_tokenizer import HFTokenizer, Precompiled, load_tokenizer

TEXTS = [
    "Hello world!", "  leading and   multiple spaces", "naïve café — ünïcode",
    "numbers 12345 and 12 34", "can't won't I'll we're", "", "x", " ",
    "CamelCase mixedUP words", "tab\tand\nnewline", "punct!!! ... ???",
    "日本語のテキスト", "emoji 🙂 test", "a" * 50, "hello world", "HELLO WoRLD",
    "trailing space ", "'quoted' \"strings\"", "a-b_c.d/e", "1,000,000.00",
]


def _roundtrip(tok: Tokenizer, tmp_path) -> HFTokenizer:
    path = str(tmp_path / "tokenizer.json")
    tok.save(path)
    return HFTokenizer.from_file(path)


def _assert_parity(tok: Tokenizer, mine: HFTokenizer, texts=TEXTS, add_special=True):
    for t in texts:
        ref = tok.encode(t, add_special_tokens=add_special).ids
        got = mine.encode(t, add_special_tokens=add_special)
        assert got == ref, (t, ref, got)


def _t5_style(byte_fallback=False, prepend_scheme="always"):
    vocab = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0)]
    words = [
        "▁Hello", "▁world", "!", "▁", "Hello", "wor", "ld", "▁can", "'", "t",
        "▁numbers", "▁and", "▁a", "a", "b", "c", "d", "e", "s", "▁s", "es",
        "▁the", "he", "▁te", "xt", "n", "ai", "ve", "▁caf", "é", "naï",
        "1", "2", "3", "4", "5", "▁1", "▁12", ".", "?", "▁p", "unct",
    ]
    seen = set()
    for i, w in enumerate(words):
        if w not in seen:
            vocab.append((w, -float(1 + 0.1 * i)))
            seen.add(w)
    if byte_fallback:
        vocab += [(f"<0x{b:02X}>", -12.0) for b in range(256)]
    tok = Tokenizer(models.Unigram(vocab, unk_id=2, byte_fallback=byte_fallback))
    tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁", prepend_scheme=prepend_scheme)
    tok.post_processor = processors.TemplateProcessing(
        single="$A </s>", pair="$A </s> $B </s>", special_tokens=[("</s>", 1)]
    )
    return tok


def test_t5_unigram_parity(tmp_path):
    tok = _t5_style()
    _assert_parity(tok, _roundtrip(tok, tmp_path))


def test_unigram_byte_fallback_and_prepend_first(tmp_path):
    tok = _t5_style(byte_fallback=True, prepend_scheme="first")
    _assert_parity(tok, _roundtrip(tok, tmp_path))


def test_added_special_token_image(tmp_path):
    tok = _t5_style()
    tok.add_special_tokens([AddedToken("<image>", normalized=False, special=True)])
    mine = _roundtrip(tok, tmp_path)
    _assert_parity(
        tok, mine,
        ["<image> Hello world", "a<image>b", "no image", "<image><image>", "<image>"],
    )


_LLAMA_RE = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}"
    r"| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)


def _llama3_style():
    base = [chr(c) for c in range(33, 127)] + ["Ġ", "Ċ", "ĉ"]
    vocab, merges = {}, []
    for ch in base:
        vocab[ch] = len(vocab)
    for pair, tok in [
        (("H", "e"), "He"), (("l", "l"), "ll"), (("He", "ll"), "Hell"),
        (("Hell", "o"), "Hello"), (("Ġ", "w"), "Ġw"), (("o", "r"), "or"),
        (("Ġw", "or"), "Ġwor"), (("l", "d"), "ld"), (("Ġwor", "ld"), "Ġworld"),
        (("1", "2"), "12"), (("3", "4"), "34"), (("12", "34"), "1234"),
        (("c", "a"), "ca"), (("ca", "n"), "can"), (("'", "t"), "'t"),
    ]:
        merges.append(pair)
        vocab[tok] = len(vocab)
    vocab["<|begin_of_text|>"] = len(vocab)
    tok = Tokenizer(models.BPE(vocab=vocab, merges=merges, ignore_merges=True))
    tok.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(pattern=Regex(_LLAMA_RE), behavior="isolated", invert=False),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    tok.post_processor = processors.TemplateProcessing(
        single="<|begin_of_text|> $A",
        special_tokens=[("<|begin_of_text|>", vocab["<|begin_of_text|>"])],
    )
    return tok


def test_llama3_bpe_parity(tmp_path):
    tok = _llama3_style()
    _assert_parity(tok, _roundtrip(tok, tmp_path))


_CLIP_RE = (
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
)


def _clip_style():
    base = [chr(c) for c in range(33, 127)] + ["Ġ", "Ċ", "ĉ"]
    vocab, merges = {}, []
    for ch in base:
        vocab[ch] = len(vocab)
    for ch in "abcdefghijklmnopqrstuvwxyz":
        vocab[ch + "</w>"] = len(vocab)
    for pair, tok in [
        (("h", "e"), "he"), (("l", "l"), "ll"), (("he", "ll"), "hell"),
        (("hell", "o</w>"), "hello</w>"), (("w", "o"), "wo"), (("r", "l"), "rl"),
        (("rl", "d</w>"), "rld</w>"), (("wo", "rld</w>"), "world</w>"),
        (("1", "2"), "12"), (("'", "t</w>"), "'t</w>"),
    ]:
        merges.append(pair)
        vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    tok = Tokenizer(models.BPE(vocab=vocab, merges=merges, end_of_word_suffix="</w>"))
    tok.normalizer = normalizers.Sequence([
        normalizers.NFC(), normalizers.Replace(Regex(r"\s+"), " "), normalizers.Lowercase(),
    ])
    tok.pre_tokenizer = pre_tokenizers.Split(pattern=Regex(_CLIP_RE), behavior="removed", invert=True)
    tok.post_processor = processors.RobertaProcessing(
        sep=("<|endoftext|>", vocab["<|endoftext|>"]),
        cls=("<|startoftext|>", vocab["<|startoftext|>"]),
    )
    return tok


def test_clip_bpe_parity(tmp_path):
    tok = _clip_style()
    _assert_parity(tok, _roundtrip(tok, tmp_path))


def test_gpt2_byte_level_with_regex(tmp_path):
    base = [chr(c) for c in range(33, 127)] + ["Ġ", "Ċ", "ĉ", "Ĥ", "ł", "Ń"]
    vocab, merges = {}, []
    for ch in base:
        vocab[ch] = len(vocab)
    for pair, tok in [(("Ġ", "a"), "Ġa"), (("l", "o"), "lo"), (("Ġa", "nd"), "Ġand"), (("n", "d"), "nd")]:
        merges.append(pair)
        vocab[tok] = len(vocab)
    # GPT-2 vocab covers all 256 byte symbols; add the rest
    from alg_tpu.io.hf_tokenizer import _byte_encoder

    for sym in _byte_encoder().values():
        vocab.setdefault(sym, len(vocab))
    tok = Tokenizer(models.BPE(vocab=vocab, merges=merges))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True, use_regex=True)
    _assert_parity(tok, _roundtrip(tok, tmp_path))


def test_wordlevel_whitespace_parity(tmp_path):
    words = {"<pad>": 0, "</s>": 1, "<unk>": 2, "a": 3, "red": 4, "bus": 5, "<image>": 6}
    tok = Tokenizer(models.WordLevel(words, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.add_special_tokens(["<image>"])
    mine = _roundtrip(tok, tmp_path)
    _assert_parity(tok, mine, ["a red bus", "a blue <image> bus!", "x,y"])


def test_load_tokenizer_padding_truncation_matches_transformers(tmp_path):
    """Pad/truncate semantics vs PreTrainedTokenizerFast — incl. </s>
    surviving truncation (HF trims the body, not the specials)."""
    transformers = pytest.importorskip("transformers")

    tok = _t5_style()
    d = tmp_path / "tok"
    d.mkdir()
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "pad_token": "<pad>", "eos_token": "</s>", "unk_token": "<unk>",
    }))
    native = load_tokenizer(str(d))
    hf = transformers.AutoTokenizer.from_pretrained(str(d))
    for max_len in (4, 8, 32):
        ref = hf(TEXTS, padding="max_length", max_length=max_len, truncation=True,
                 add_special_tokens=True, return_tensors="np")
        ids, mask = native(TEXTS, max_len)
        np.testing.assert_array_equal(ids, ref["input_ids"])
        np.testing.assert_array_equal(mask, ref["attention_mask"])
        assert all(row[-1] in (1, 0) for row in ids)  # </s> or pad at the end


def test_tiny_checkpoint_tokenizers_native_equals_transformers(tmp_path):
    """model_zoo's native path == the AutoTokenizer path on a real tiny
    checkpoint tokenizer (WordLevel + Whitespace + added <image>)."""
    transformers = pytest.importorskip("transformers")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_tiny_checkpoint

    root = tmp_path / "ck"
    make_tiny_checkpoint.make_tokenizer(str(root))
    native = load_tokenizer(str(root / "tokenizer"))
    hf = transformers.AutoTokenizer.from_pretrained(str(root / "tokenizer"))
    prompts = ["a red double decker bus", "the panda <image> driving", "unknown words here"]
    ref = hf(prompts, padding="max_length", max_length=16, truncation=True,
             add_special_tokens=True, return_tensors="np")
    ids, mask = native(prompts, 16)
    np.testing.assert_array_equal(ids, ref["input_ids"])
    np.testing.assert_array_equal(mask, ref["attention_mask"])


def _darts_unit(label=0, has_leaf=False, offset=0, extend=False):
    assert offset < (1 << 21)
    return (offset << 10) | ((1 << 9) if extend else 0) | ((1 << 8) if has_leaf else 0) | label


def test_precompiled_charsmap_hand_built():
    """Parse + apply a hand-built darts double-array charsmap: 'A'→'a',
    'B'→'bb' (the spm_precompiled unit layout: label 8 bits, has_leaf bit 8,
    extend bit 9, offset bits 10+)."""
    units = [0] * 16
    # root: offset 0x40
    units[0] = _darts_unit(offset=0x40)
    # child 'A' (0x41) at 0x40 ^ 0x41 = 1; its value cell at 1 ^ 4 = 5
    units[1] = _darts_unit(label=0x41, has_leaf=True, offset=4)
    units[5] = (1 << 31) | 0  # value 0 → normalized[0:]
    # child 'B' (0x42) at 0x40 ^ 0x42 = 2; value cell at 2 ^ 8 = 10
    units[2] = _darts_unit(label=0x42, has_leaf=True, offset=8)
    units[10] = (1 << 31) | 2  # value 2 → normalized[2:]
    normalized = b"a\0bb\0"
    trie_bytes = b"".join(u.to_bytes(4, "little") for u in units)
    blob = len(trie_bytes).to_bytes(4, "little") + trie_bytes + normalized
    import base64

    pc = Precompiled(base64.b64encode(blob).decode())
    assert pc.normalize("A") == "a"
    assert pc.normalize("B") == "bb"
    assert pc.normalize("AB C") == "abb C"
    assert pc.normalize("ünïcode 🙂") == "ünïcode 🙂"  # untouched
