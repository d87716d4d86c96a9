"""Tokenizer/BPE encoder family (diffnorm_tpu/data/encoders.py) vs the
VERBATIM reference encoders (fairseq/data/encoders/*, data_utils.post_process).
"""

import json

import pytest

from diffnorm_tpu.config import Config
from diffnorm_tpu.data import encoders as E

from reference_loader import load_encoders, load_post_process

SAMPLES = [
    "hello world",
    "  multi   space\tand tabs ",
    "ünïcøde Ärger — em-dash café",
    "emoji 🤖 mixed ASCII",
    "",
]


def test_post_process_reference_parity():
    ref_pp = load_post_process()
    sentences = [
        "a@@ b c@@ d",
        "▁he llo ▁wor ld",
        "h e l l o | w o r l d |",
        "_EOWa b_EOW c d_EOW",
        "x <SIL> y  <SIL>z",
        "to ken _stream_",
        "plain text",
    ]
    for symbol in ["sentencepiece", "wordpiece", "letter", "silence",
                   "_EOW", "subword_nmt", "@@ ", "@@", "none", None]:
        for s in sentences:
            assert E.post_process(s, symbol) == ref_pp(s, symbol), (
                symbol, s)
    with pytest.raises(NotImplementedError):
        E.post_process("x", "bogus_symbol")


def test_characters_bytes_space_reference_parity():
    ref = load_encoders()
    ours_c, ref_c = E.Characters(), ref.characters.Characters()
    ours_b, ref_b = E.Bytes(), ref.bytes.Bytes()
    ours_s, ref_s = E.SpaceTokenizer(), ref.space.SpaceTokenizer()
    for s in SAMPLES:
        assert ours_c.encode(s) == ref_c.encode(s)
        assert ours_c.decode(ours_c.encode(s)) == ref_c.decode(ref_c.encode(s))
        assert ours_b.encode(s) == ref_b.encode(s)
        assert ours_b.decode(ours_b.encode(s)) == ref_b.decode(ref_b.encode(s))
        assert ours_s.encode(s) == ref_s.encode(s)
    # broken UTF-8 recovery path (smart_byte_decode DP)
    bu = ref.byte_utils
    broken = bu.byte_encode("héllo")[:-1]  # cut a multibyte char in half
    assert E.smart_byte_decode(broken) == bu.smart_byte_decode(broken)
    broken2 = bu.byte_encode("a🤖b")[2:-1]
    assert E.smart_byte_decode(broken2) == bu.smart_byte_decode(broken2)


def test_byte_table_reference_parity():
    ref = load_encoders()
    assert E._BYTE_TO_CHAR == ref.byte_utils.BYTE_TO_BCHAR


def _write_codes(tmp_path, merges, version="0.2"):
    p = tmp_path / "codes.bpe"
    lines = [f"#version: {version}"] + [f"{a} {b}" for a, b in merges]
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(p)


def test_subword_nmt_apply(tmp_path):
    # lowest-rank-first merging with </w> end-of-word marker (v0.2)
    codes = _write_codes(tmp_path, [
        ("l", "o"), ("lo", "w</w>"), ("h", "e"), ("he", "llo</w>"),
        ("l", "lo</w>"),
    ])
    bpe = E.SubwordNMTBPE(Config(bpe_codes=codes))
    # "low" -> l+o merge, then lo+w</w> -> one token
    assert bpe.encode("low") == "low"
    # "hello": h+e -> he; l,l,o</w>: (l,lo</w>) rank 4 needs lo</w> which
    # never forms ((l,o) rank 0 only matches non-final o) -> he@@ l@@ l@@ o
    assert bpe.encode("hello") == "he@@ l@@ l@@ o"
    # "lol": l+o -> lo (rank 0 applies mid-word); final l unmerged
    assert bpe.encode("lol") == "lo@@ l"
    # multi-word line + round trip through the stream post-process
    enc = bpe.encode("low hello low")
    assert enc == "low he@@ l@@ l@@ o low"
    assert bpe.decode(enc) == "low hello low"
    assert E.post_process(enc, "subword_nmt") == "low hello low"
    # unknown word stays character-segmented
    assert bpe.encode("zz") == "z@@ z"


def test_subword_nmt_v01_semantics(tmp_path):
    # v0.1: </w> is a standalone symbol, so (l, o) merges word-final "lo"
    codes_v1 = _write_codes(tmp_path, [("l", "o")], version="0.1")
    bpe = E.SubwordNMTBPE(Config(bpe_codes=codes_v1))
    assert bpe.encode("lo") == "lo"
    codes_v2 = _write_codes(tmp_path, [("l", "o")], version="0.2")
    bpe2 = E.SubwordNMTBPE(Config(bpe_codes=codes_v2))
    # v0.2: final char is "o</w>", pair (l, o) never matches
    assert bpe2.encode("lo") == "l@@ o"


def _gpt2_assets(tmp_path):
    """Tiny but complete encoder.json/vocab.bpe covering the test corpus."""
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
              ("Ġ", "w"), ("o", "r"), ("Ġw", "or"), ("Ġwor", "ld"),
              ("l", "d")]
    # vocab: every single byte-char + every merge product
    b2u = E.gpt2_bytes_to_unicode()
    tokens = sorted(set(b2u.values()))
    for a, b in merges:
        tokens.append(a + b)
    enc = {t: i for i, t in enumerate(dict.fromkeys(tokens))}
    ej = tmp_path / "encoder.json"
    ej.write_text(json.dumps(enc), encoding="utf-8")
    vb = tmp_path / "vocab.bpe"
    vb.write_text("#version: 0.2\n" + "\n".join(
        f"{a} {b}" for a, b in merges) + "\n", encoding="utf-8")
    return str(ej), str(vb)


def test_gpt2_bpe_vs_vendored_reference(tmp_path):
    ref = load_encoders()
    ej, vb = _gpt2_assets(tmp_path)
    ref_enc = ref.gpt2_utils.get_encoder(ej, vb)
    ours = E.GPT2BPE(encoder_json=ej, vocab_bpe=vb)
    for s in ["hello world", "hello hello", " worldly he said!",
              "Hello WORLD", "tab\tand  spaces", "ünïcøde 🤖"]:
        assert ours.encode_ids(s) == ref_enc.encode(s), s
        assert ours.decode(ours.encode(s)) == ref_enc.decode(
            ref_enc.encode(s)), s
        # gpt2 byte-level BPE is lossless
        assert ours.decode(ours.encode(s)) == s


def test_gpt2_bytes_to_unicode_parity():
    ref = load_encoders()
    assert E.gpt2_bytes_to_unicode() == ref.gpt2_utils.bytes_to_unicode()


def test_moses_tokenizer_roundtrip():
    tok = E.MosesTokenizerWrapper(Config(source_lang="en", target_lang="en"))
    enc = tok.encode("Hello, world! It's nice.")
    assert enc.split() == ["Hello", ",", "world", "!", "It",
                           "&apos;s", "nice", "."]
    assert tok.decode(enc) == "Hello, world! It's nice."
    noesc = E.MosesTokenizerWrapper(
        Config(source_lang="en", target_lang="en", moses_no_escape=True))
    assert "&apos;" not in noesc.encode("It's")


def test_build_and_compose():
    cfg = Config(tokenizer="space", bpe="characters")
    tok = E.build_tokenizer(cfg)
    bpe = E.build_bpe(cfg)
    raw = "ab  cd"
    enc = E.encode_fn(raw, bpe=bpe, tokenizer=tok)
    assert enc == "a b ▁ c d"
    assert E.decode_fn(enc, bpe=bpe, tokenizer=tok) == "ab cd"
    assert E.build_tokenizer(Config()) is None
    assert E.build_bpe(Config()) is None
