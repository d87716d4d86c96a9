"""Eval tooling: unit-BLEU parsing, BLEU accumulator, MCD, indexed datasets,
preprocess CLI, score CLI."""

import os
from pathlib import Path

import numpy as np
import pytest

from diffnorm_tpu.data.dictionary import Dictionary
from diffnorm_tpu.data.indexed_dataset import (
    IndexedDataset,
    IndexedDatasetBuilder,
    binarize_file,
)
from diffnorm_tpu.eval.bleu import BleuAccumulator, corpus_bleu
from diffnorm_tpu.eval.mcd import mel_cepstral_distortion
from diffnorm_tpu.eval.unit_bleu import extract_unit_files, unit_bleu


def test_bleu_accumulator_sanity():
    acc = BleuAccumulator()
    acc.add("1 2 3 4 5".split(), "1 2 3 4 5".split())
    assert acc.score() == pytest.approx(100.0, abs=0.01)
    acc2 = BleuAccumulator()
    acc2.add("1 2 3 4 5".split(), "9 9 9 9 9".split())
    assert acc2.score() == 0.0


def test_corpus_bleu_against_sacrebleu():
    sacrebleu = pytest.importorskip("sacrebleu")
    refs = ["5 6 7 8 9 10", "1 2 3 4 5 6 7"]
    hyps = ["5 6 7 8 9 10", "1 2 3 9 5 6 7"]
    ours = BleuAccumulator()
    for r, h in zip(refs, hyps):
        ours.add(r.split(), h.split())
    theirs = sacrebleu.corpus_bleu(
        hyps, [refs], tokenize="none", smooth_method="none"
    ).score
    assert ours.score() == pytest.approx(theirs, abs=0.5)


def test_unit_bleu_roundtrip(tmp_path):
    gen = tmp_path / "generate-test.txt"
    gen.write_text(
        "T-0\t5 6 7 8 9\nH-0\t-0.5\t5 6 7 8 9\nD-0\t-0.5\t5 6 7 8 9\n"
        "T-1\t8 9 10 11\nH-1\t-0.7\t8 9 10 11\nD-1\t-0.7\t8 9 10 11\n"
    )
    hyp, ref = extract_unit_files(str(gen), str(tmp_path))
    assert os.path.exists(hyp) and os.path.exists(ref)
    assert unit_bleu(str(gen)) == pytest.approx(100.0, abs=0.1)


def test_unit_files_bleu_guards_partial_coverage(tmp_path):
    """A hyp file missing reference ids must fail loudly, not silently
    score the intersection (advisor r4 medium: a decode dropping
    utterances would inflate the parity number)."""
    from diffnorm_tpu.eval.unit_bleu import unit_files_bleu

    ref = tmp_path / "ref.unit"
    ref.write_text("utt0|5 6 7 8 9\nutt1|8 9 10 11 12\nutt2|5 5 5 6 6\n")
    full = tmp_path / "full.unit"
    full.write_text("utt2|5 5 5 6 6\nutt0|5 6 7 8 9\nutt1|8 9 10 11 12\n")
    # full coverage (any order): perfect score
    assert unit_files_bleu(str(full), str(ref)) == pytest.approx(100.0,
                                                                 abs=0.1)
    partial = tmp_path / "partial.unit"
    partial.write_text("utt0|5 6 7 8 9\nutt1|8 9 10 11 12\n")
    with pytest.raises(SystemExit, match="no hypothesis"):
        unit_files_bleu(str(partial), str(ref))
    # explicit override still scores the intersection
    assert unit_files_bleu(str(partial), str(ref),
                           allow_partial=True) == pytest.approx(100.0,
                                                                abs=0.1)
    # extra hypothesis ids are ignored (warned), not an error
    extra = tmp_path / "extra.unit"
    extra.write_text(full.read_text() + "utt9|1 2 3 4 5\n")
    assert unit_files_bleu(str(extra), str(ref)) == pytest.approx(100.0,
                                                                  abs=0.1)


def test_mcd_identical_is_zero():
    rng = np.random.default_rng(0)
    wav = rng.normal(size=8000).astype(np.float32)
    assert mel_cepstral_distortion(wav, wav) == pytest.approx(0.0, abs=1e-4)
    wav2 = rng.normal(size=8000).astype(np.float32)
    assert mel_cepstral_distortion(wav, wav2) > 1.0


def test_indexed_dataset_roundtrip(tmp_path):
    prefix = str(tmp_path / "data")
    b = IndexedDatasetBuilder(prefix)
    seqs = [np.array([4, 5, 6], np.int32), np.array([7], np.int32),
            np.array([8, 9], np.int32)]
    for s in seqs:
        b.add_item(s)
    b.finalize()
    ds = IndexedDataset(prefix)
    assert len(ds) == 3
    for i, s in enumerate(seqs):
        np.testing.assert_array_equal(ds[i], s)
        assert ds.num_tokens(i) == len(s)


def test_preprocess_cli(tmp_path):
    (tmp_path / "train.src").write_text("a b c\nb c d\n")
    (tmp_path / "train.tgt").write_text("x y\ny z\n")
    from diffnorm_tpu.cli.preprocess import main

    dest = str(tmp_path / "bin")
    main([
        "--source-lang", "src", "--target-lang", "tgt",
        "--trainpref", str(tmp_path / "train"), "--destdir", dest,
    ])
    d = Dictionary.load(os.path.join(dest, "dict.src.txt"))
    assert d.index("b") >= 4  # most frequent source word after specials
    ds = IndexedDataset(os.path.join(dest, "train.src-tgt.src"))
    assert len(ds) == 2
    # eos appended
    assert ds[0][-1] == d.eos()


def test_score_cli(tmp_path, capsys):
    (tmp_path / "hyp.txt").write_text("5 6 7 8\n8 9 10 11\n")
    (tmp_path / "ref.txt").write_text("5 6 7 8\n8 9 10 11\n")
    from diffnorm_tpu.cli.score import main

    main(["--sys", str(tmp_path / "hyp.txt"), "--ref", str(tmp_path / "ref.txt")])
    out = capsys.readouterr().out
    assert "BLEU4 = 100.00" in out

    # --order / --sentence-bleu / --ignore-case (reference fairseq_cli/score.py)
    main(["--sys", str(tmp_path / "hyp.txt"), "--ref",
          str(tmp_path / "ref.txt"), "--order", "2"])
    assert "BLEU2 = 100.00" in capsys.readouterr().out
    main(["--sys", str(tmp_path / "hyp.txt"), "--ref",
          str(tmp_path / "ref.txt"), "--sentence-bleu"])
    out = capsys.readouterr().out
    assert out.count("BLEU4 = 100.00") == 2 and out.startswith("0 ")
    (tmp_path / "hyp_uc.txt").write_text("A b\n")
    (tmp_path / "ref_lc.txt").write_text("a b\n")
    main(["--sys", str(tmp_path / "hyp_uc.txt"), "--ref",
          str(tmp_path / "ref_lc.txt"), "--ignore-case", "--order", "1"])
    assert "BLEU1 = 100.00" in capsys.readouterr().out
    # stdin hypotheses (--sys -)
    import io, sys as _sys

    old = _sys.stdin
    try:
        _sys.stdin = io.StringIO("5 6 7 8\n8 9 10 11\n")
        main(["--ref", str(tmp_path / "ref.txt")])
    finally:
        _sys.stdin = old
    assert "BLEU4 = 100.00" in capsys.readouterr().out


def test_get_manifest_cli(tmp_path):
    import numpy as np

    from diffnorm_tpu.cli.generate_waveform import write_wav
    from diffnorm_tpu.cli.get_manifest import main

    root = tmp_path / "wavs"
    (root / "sub").mkdir(parents=True)
    write_wav(str(root / "a.wav"), np.zeros(160, np.float32), 16000)
    write_wav(str(root / "sub" / "b.wav"), np.zeros(320, np.float32), 16000)
    dest = tmp_path / "out" / "train.tsv"
    assert main([str(root), "--dest", str(dest)]) == 0
    lines = dest.read_text().strip().split("\n")
    assert lines[0] == str(root.resolve())
    entries = dict(l.split("\t") for l in lines[1:])
    assert entries["a.wav"] == "160"
    assert entries[str(Path("sub") / "b.wav")] == "320"


def test_average_checkpoints_cli(tmp_path):
    """scripts/average_checkpoints.py parity: float leaves are averaged in
    f64 and cast back, integer leaves (step) pass through, and the output
    is a loadable checkpoint."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from diffnorm_tpu.cli.average_checkpoints import main
    from diffnorm_tpu.train.checkpoint import (
        load_checkpoint_params,
        restored_to_variables,
    )

    ckptr = ocp.StandardCheckpointer()
    paths = []
    for i, scale in enumerate((1.0, 3.0)):
        tree = {
            "step": np.asarray(10 * (i + 1), np.int32),
            "params": {"w": np.full((4, 4), scale, np.float32),
                       "b": np.asarray([scale], jnp.bfloat16)},
        }
        p = str(tmp_path / f"ck{i}")
        ckptr.save(p, tree)
        paths.append(p)
    ckptr.wait_until_finished()
    out = str(tmp_path / "avg")
    assert main(["--inputs", *paths, "--output", out]) == 0

    avg = load_checkpoint_params(out)
    np.testing.assert_allclose(np.asarray(avg["params"]["w"]), 2.0)
    np.testing.assert_allclose(np.asarray(avg["params"]["b"], np.float32), 2.0)
    assert int(avg["step"]) == 10  # non-float leaves keep the first value
    # the averaged checkpoint canonicalizes like any --path checkpoint
    assert restored_to_variables(avg)["params"]["w"].shape == (4, 4)


def test_mcd_different_wavs_finite_positive():
    """MCD with DTW over two different waveforms (the TTS eval path,
    reference batch_mel_cepstral_distortion) is finite and positive, and
    symmetric-ish under swapping."""
    from diffnorm_tpu.eval.mcd import (
        batch_mel_cepstral_distortion,
        mel_cepstral_distortion,
    )

    rng = np.random.default_rng(0)
    a = (rng.normal(size=4000) * 0.1).astype(np.float32)
    b = (rng.normal(size=4800) * 0.1).astype(np.float32)
    mcd = mel_cepstral_distortion(a, b)
    assert np.isfinite(mcd) and mcd > 0
    mean, vals = batch_mel_cepstral_distortion([a, b], [b, a])
    assert len(vals) == 2 and np.isfinite(mean) and mean > 0


# --------------------------------------------------------------------------
# Binarized-format interchange with the REAL fairseq indexed_dataset.py
# (fairseq-preprocess output must load here and vice versa)
# --------------------------------------------------------------------------

def _ref_indexed():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from reference_loader import load_indexed_dataset

    return load_indexed_dataset()


def test_mmap_format_reads_real_fairseq_output(tmp_path):
    """Data written by the VERBATIM reference MMapIndexedDatasetBuilder
    (what fairseq-preprocess emits, uint16 at small vocabs) loads in our
    reader with identical sizes and tokens."""
    import torch

    ref = _ref_indexed()
    prefix = str(tmp_path / "ref_mmap")
    dtype = ref.best_fitting_int_dtype(1000)
    assert dtype == np.uint16  # the regime real preprocessed data ships in
    b = ref.MMapIndexedDatasetBuilder(prefix + ".bin", dtype=dtype)
    seqs = [np.array([4, 5, 6, 2], np.int64), np.array([7, 2], np.int64),
            np.array([999, 8, 9, 2], np.int64)]
    for s in seqs:
        b.add_item(torch.from_numpy(s))
    b.finalize(prefix + ".idx")

    from diffnorm_tpu.data.indexed_dataset import (
        IndexedDataset as OurDataset,
        infer_dataset_impl,
    )

    assert infer_dataset_impl(prefix) == "mmap"
    ours = OurDataset(prefix)
    theirs = ref.MMapIndexedDataset(prefix)
    assert len(ours) == len(theirs) == 3
    for i, s in enumerate(seqs):
        np.testing.assert_array_equal(ours[i], s)
        np.testing.assert_array_equal(ours[i], theirs[i].numpy())
        assert ours.num_tokens(i) == int(theirs.sizes[i])


def test_mmap_format_written_here_loads_in_real_fairseq(tmp_path):
    """Our MMapIndexedDatasetBuilder output byte-matches the reference
    layout: the VERBATIM reference reader loads it back exactly."""
    from diffnorm_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder

    ref = _ref_indexed()
    prefix = str(tmp_path / "our_mmap")
    b = MMapIndexedDatasetBuilder(prefix, dtype=np.uint16)
    seqs = [np.array([4, 5, 6, 2], np.int64), np.array([7, 2], np.int64)]
    for s in seqs:
        b.add_item(s)
    b.finalize()
    theirs = ref.MMapIndexedDataset(prefix)
    assert len(theirs) == 2
    for i, s in enumerate(seqs):
        np.testing.assert_array_equal(theirs[i].numpy(), s)

    # and byte-for-byte: the reference writer produces the identical .idx
    import torch

    prefix2 = str(tmp_path / "ref_mmap")
    b2 = ref.MMapIndexedDatasetBuilder(prefix2 + ".bin", dtype=np.uint16)
    for s in seqs:
        b2.add_item(torch.from_numpy(s))
    b2.finalize(prefix2 + ".idx")
    with open(prefix + ".idx", "rb") as f1, open(prefix2 + ".idx", "rb") as f2:
        assert f1.read() == f2.read()
    with open(prefix + ".bin", "rb") as f1, open(prefix2 + ".bin", "rb") as f2:
        assert f1.read() == f2.read()


def test_legacy_tntidx_format_reads(tmp_path):
    """The legacy/cached TorchNet layout (reference IndexedDatasetBuilder)
    also loads here (older fairseq-preprocess runs used --dataset-impl
    cached/lazy)."""
    import torch

    ref = _ref_indexed()
    prefix = str(tmp_path / "legacy")
    b = ref.IndexedDatasetBuilder(prefix + ".bin", dtype=np.int32)
    seqs = [np.array([4, 5, 6, 2], np.int32), np.array([7, 2], np.int32)]
    for s in seqs:
        b.add_item(torch.from_numpy(s))
    b.finalize(prefix + ".idx")

    from diffnorm_tpu.data.indexed_dataset import (
        IndexedDataset as OurDataset,
        infer_dataset_impl,
    )

    assert infer_dataset_impl(prefix) == "cached"
    ours = OurDataset(prefix)
    # fairseq loads this layout with fix_lua_indexing=True (the builder
    # wrote tokens +1; data_utils.load_indexed_dataset:107-110)
    theirs = ref.IndexedDataset(prefix, fix_lua_indexing=True)
    assert len(ours) == len(theirs) == 2
    for i, s in enumerate(seqs):
        np.testing.assert_array_equal(ours[i], s)
        np.testing.assert_array_equal(ours[i], theirs[i].numpy())


def test_preprocess_cli_emits_fairseq_mmap(tmp_path):
    """fairseq-preprocess parity end-to-end: the preprocess CLI's default
    output is the mmap layout the real fairseq loads."""
    (tmp_path / "train.src").write_text("a b c\nb c d\n")
    (tmp_path / "train.tgt").write_text("x y\ny z\n")
    from diffnorm_tpu.cli.preprocess import main

    dest = str(tmp_path / "bin")
    main([
        "--source-lang", "src", "--target-lang", "tgt",
        "--trainpref", str(tmp_path / "train"), "--destdir", dest,
    ])
    ref = _ref_indexed()
    prefix = os.path.join(dest, "train.src-tgt.src")
    theirs = ref.MMapIndexedDataset(prefix)
    d = Dictionary.load(os.path.join(dest, "dict.src.txt"))
    assert len(theirs) == 2 and int(theirs[0][-1]) == d.eos()


def test_wer_accumulator_matches_bruteforce():
    """eval/wer.py (reference fairseq/scoring/wer.py semantics): corpus
    WER = summed word edit distance / summed reference words, native
    csrc:edit_distance_batch vs a brute-force python DP."""
    from diffnorm_tpu.eval.wer import WerAccumulator

    def dp(a, b):
        prev = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            cur = [i] + [0] * len(b)
            for j in range(1, len(b) + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[-1]

    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(12)]
    acc = WerAccumulator()
    dist = ref_len = 0
    for _ in range(20):
        ref = list(rng.choice(words, size=int(rng.integers(1, 9))))
        hyp = list(rng.choice(words, size=int(rng.integers(0, 9))))
        acc.add(" ".join(ref), " ".join(hyp))
        dist += dp(ref, hyp)
        ref_len += len(ref)
    assert acc.distance == dist and acc.ref_length == ref_len
    assert abs(acc.score() - 100.0 * dist / ref_len) < 1e-9
