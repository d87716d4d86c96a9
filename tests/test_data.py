"""Data layer: dictionary, unit reduction, batching (py + C++), iterators,
manifests, datasets over a synthetic data dir."""

import math
import os

import numpy as np
import pytest

from diffnorm_tpu.data.batching import _load_native, batch_by_size
from diffnorm_tpu.data.dictionary import Dictionary
from diffnorm_tpu.data.iterators import EpochBatchIterator, GroupedIterator
from diffnorm_tpu.data.manifest import (
    read_feature_manifest,
    read_translation_manifest,
    write_feature_manifest,
    write_translation_manifest,
)
from diffnorm_tpu.ops.unit_reduce import expand_units, reduce_units


def test_dictionary_special_layout():
    d = Dictionary.unit_dictionary(1000)
    assert (d.bos(), d.pad(), d.eos(), d.unk()) == (0, 1, 2, 3)
    assert len(d) == 1004
    assert d.index("0") == 4          # +4 unit offset parity
    assert d.index("999") == 1003
    enc = d.encode_line("5 7 7 2", append_eos=True)
    np.testing.assert_array_equal(enc, [9, 11, 11, 6, 2])


def test_dictionary_save_load(tmp_path):
    d = Dictionary.unit_dictionary(10)
    p = str(tmp_path / "dict.txt")
    d.save(p)
    d2 = Dictionary.load(p)
    assert d == d2


def test_reduce_units_semantics():
    toks = [5, 5, 5, 7, 7, 3, 5, 5]
    dedup, dur, keep = reduce_units(toks)
    np.testing.assert_array_equal(dedup, [5, 7, 3, 5])
    np.testing.assert_array_equal(dur, [3, 2, 1, 2])
    np.testing.assert_array_equal(keep, [0, 3, 5, 6])
    np.testing.assert_array_equal(expand_units(dedup, dur), toks)


def test_reduce_units_padded_matches_numpy():
    import jax.numpy as jnp

    from diffnorm_tpu.ops.unit_reduce import reduce_units_padded

    rng = np.random.default_rng(0)
    toks = rng.integers(0, 5, size=24).astype(np.int32)
    valid = np.ones(24, bool)
    valid[20:] = False
    out, keep, count = reduce_units_padded(jnp.asarray(toks), jnp.asarray(valid))
    ref_dedup, _, ref_keep = reduce_units(toks[:20])
    assert int(count) == len(ref_dedup)
    np.testing.assert_array_equal(np.asarray(out)[: int(count)], ref_dedup)


def test_batch_by_size_max_tokens():
    sizes = np.asarray([10, 10, 10, 5, 5, 5])
    indices = np.arange(6)
    batches = batch_by_size(indices, sizes, max_tokens=20)
    # padding-aware: batch cost = count * max_len in batch
    for b in batches:
        assert len(b) * sizes[b].max() <= 20
    assert sorted(int(i) for b in batches for i in b) == list(range(6))


def test_batch_by_size_native_matches_python():
    lib = _load_native()
    if not lib:
        pytest.skip("native lib not built")
    rng = np.random.default_rng(0)
    sizes = rng.integers(1, 50, size=200)
    indices = np.argsort(-sizes, kind="stable")
    from diffnorm_tpu.data.batching import _batch_by_size_py

    native = batch_by_size(indices, sizes, max_tokens=256, max_sentences=16,
                           required_batch_size_multiple=2)
    py = _batch_by_size_py(indices, sizes[indices], 256, 16, 2)
    assert len(native) == len(py)
    for a, b in zip(native, py):
        np.testing.assert_array_equal(a, b)


def test_grouped_iterator():
    g = GroupedIterator(iter(range(7)), 3)
    chunks = list(g)
    assert chunks == [[0, 1, 2], [3, 4, 5], [6]]


class _ToyDataset:
    def __init__(self, n=10):
        self.n = n

    def __len__(self):
        return self.n

    def num_tokens(self, i):
        return 4

    def ordered_indices(self):
        return np.arange(self.n)

    def __getitem__(self, i):
        return i

    def collater(self, samples):
        return np.asarray(samples)


def test_epoch_iterator_resume():
    ds = _ToyDataset(10)
    it = EpochBatchIterator(ds, max_sentences=2, shuffle=False, num_prefetch=0)
    epoch = it.next_epoch_itr()
    first_two = [next(epoch), next(epoch)]
    state = it.state_dict()
    assert state["offset"] == 2
    # fresh iterator resumes at batch 2
    it2 = EpochBatchIterator(ds, max_sentences=2, shuffle=False, num_prefetch=0)
    it2.load_state_dict(state)
    rest = list(it2.next_epoch_itr())
    assert len(rest) == 3
    np.testing.assert_array_equal(rest[0], [4, 5])


def test_manifest_roundtrip(tmp_path):
    fpath = str(tmp_path / "train.manifest.tsv")
    write_feature_manifest(fpath, "/feats", [("utt1.feat.npy", 10), ("utt2.feat.npy", 20)])
    m = read_feature_manifest(fpath)
    assert m["utt1"] == ("/feats/utt1.feat.npy", 10)

    tpath = str(tmp_path / "train.tsv")
    rows = [
        {"id": "utt1", "src_audio": "a.wav", "src_n_frames": 100,
         "tgt_audio": "1 2 3", "tgt_n_frames": 3},
    ]
    write_translation_manifest(tpath, rows)
    back = read_translation_manifest(tpath)
    assert back[0]["tgt_audio"] == "1 2 3"


def make_repr_data_dir(tmp_path, n=6, feat_dim=16, seed=0):
    """Synthesize a reference-format data dir (per tests/test_binaries.py
    create_dummy_data strategy)."""
    rng = np.random.default_rng(seed)
    feat_dir = tmp_path / "feat"
    feat_dir.mkdir(exist_ok=True)
    rows, frows = [], []
    for i in range(n):
        t = int(rng.integers(6, 14))
        units = rng.integers(0, 8, size=t)
        feat = rng.normal(size=(t, feat_dim)).astype(np.float32)
        name = f"utt{i}.feat.npy"
        np.save(feat_dir / name, feat)
        frows.append((name, t))
        rows.append({
            "id": f"utt{i}", "src_audio": f"utt{i}.wav", "src_n_frames": t,
            "tgt_audio": " ".join(map(str, units)), "tgt_n_frames": t,
        })
    write_feature_manifest(str(tmp_path / "train.manifest.tsv"), str(feat_dir), frows)
    # dataset joins {feat_dir}/{split}.manifest.tsv; put a copy there
    write_feature_manifest(str(feat_dir / "train.manifest.tsv"), str(feat_dir), frows)
    write_translation_manifest(str(tmp_path / "train.tsv"), rows)
    return tmp_path


def test_repr_dataset_end_to_end(tmp_path):
    from diffnorm_tpu.data.repr_unit_dataset import ReprToReprUnitDataset

    make_repr_data_dir(tmp_path)
    d = Dictionary.unit_dictionary(8)
    ds = ReprToReprUnitDataset.from_tsv(
        root=str(tmp_path), tgt_feat_dir=str(tmp_path / "feat"), split="train",
        tgt_dict=d, is_train=True,
    )
    assert len(ds) == 6
    item = ds[0]
    assert (item["reduce_tgt_unit"] >= 4).all()  # +4 offset applied
    assert item["reduce_tgt_feat"].shape[0] == item["reduce_tgt_unit"].shape[0]
    batch = ds.collater([ds[i] for i in range(3)])
    assert batch["reduce_target"].shape[0] == 3
    assert batch["ntokens"] == int(batch["reduce_target_lengths"].sum())
    # padding is 0 (parity: VAE losses use ignore_index=0)
    lens = batch["reduce_target_lengths"]
    assert (batch["reduce_target_unit"][0, lens[0]:] == 0).all() or lens[0] == batch["reduce_target_unit"].shape[1]


def test_fbank_shapes():
    from diffnorm_tpu.data.audio import UtteranceCMVN, logmel_fbank

    wav = np.random.default_rng(0).normal(size=16000).astype(np.float32)
    feat = logmel_fbank(wav)
    assert feat.shape == ((16000 - 400) // 160 + 1, 80)
    norm = UtteranceCMVN()(feat)
    np.testing.assert_allclose(norm.mean(axis=0), 0.0, atol=1e-3)
    np.testing.assert_allclose(norm.std(axis=0), 1.0, atol=1e-2)


def test_specaugment_masks():
    from diffnorm_tpu.data.audio import SpecAugment

    x = np.ones((50, 80), np.float32)
    sa = SpecAugment(freq_mask_n=2, freq_mask_f=10, time_mask_n=2, time_mask_t=10)
    out = sa(x, rng=np.random.default_rng(0))
    assert out.shape == x.shape


def test_cli_config_file_merging(tmp_path):
    import yaml

    from diffnorm_tpu.cli.args import parse_args

    (tmp_path / "train_cfg.yaml").write_text(
        yaml.safe_dump({"lr": 0.001, "max_update": 100, "arch": "from_file"})
    )
    cfg = parse_args([
        "/data", "--config", str(tmp_path / "train_cfg.yaml"),
        "--lr", "0.01", "--seed", "7",
    ])
    assert cfg.data == "/data"
    assert cfg.arch == "from_file"       # from the YAML
    assert cfg.max_update == 100         # from the YAML
    assert cfg.lr == 0.01                # flag overrides YAML
    assert cfg.seed == 7


def test_prefetcher_keeps_raising_stopiteration():
    """Iterator protocol: an exhausted _Prefetcher must keep raising
    StopIteration — a second next() used to block forever on the empty
    queue (deadlocked read-ahead consumers in the generate CLI)."""
    from diffnorm_tpu.data.iterators import _Prefetcher

    p = _Prefetcher(lambda: iter([1, 2]), depth=2)
    assert list(p) == [1, 2]
    for _ in range(3):
        with pytest.raises(StopIteration):
            next(p)


def test_read_ahead_order_and_exhaustion():
    from diffnorm_tpu.data.iterators import _Prefetcher, read_ahead

    # over a plain list
    assert list(read_ahead(range(5), lambda x: x * 10, depth=2)) == [
        0, 10, 20, 30, 40]
    # shorter than depth
    assert list(read_ahead([7], lambda x: x, depth=3)) == [7]
    assert list(read_ahead([], lambda x: x, depth=2)) == []
    # over a _Prefetcher (the case that used to deadlock)
    p = _Prefetcher(lambda: iter([1, 2, 3]), depth=2)
    assert list(read_ahead(p, lambda x: x, depth=2)) == [1, 2, 3]


def test_mark_trained_controls_resume_offset():
    """Mid-epoch checkpoints with a read-ahead consumer: the offset must be
    the TRAINED batch count, not the (deeper) pulled count."""
    ds = _ToyDataset(10)
    it = EpochBatchIterator(ds, max_sentences=2, shuffle=False, num_prefetch=0)
    epoch = it.next_epoch_itr()
    # a depth-2 read-ahead pulls 4 batches while only 2 were trained
    for _ in range(4):
        next(epoch)
    it.mark_trained(1)
    it.mark_trained(1)
    assert it.state_dict()["offset"] == 2


def test_mark_trained_on_fresh_iterator():
    """mark_trained before next_epoch_itr (e.g. a just-restored trainer that
    replays a cached batch) must not raise; it counts from offset 0."""
    ds = _ToyDataset(10)
    it = EpochBatchIterator(ds, max_sentences=2, shuffle=False, num_prefetch=0)
    it.mark_trained(1)
    assert it.state_dict()["offset"] == 1


def test_finish_epoch_resets_saved_offset():
    """A save AFTER finish_epoch must record offset 0 into the next epoch,
    not the stale full-epoch batch count (which skipped a whole epoch of
    data on resume)."""
    ds = _ToyDataset(10)
    it = EpochBatchIterator(ds, max_sentences=2, shuffle=False, num_prefetch=0)
    list(it.next_epoch_itr())
    it.finish_epoch()
    state = it.state_dict()
    assert state["offset"] == 0
    assert state["epoch"] == 2
    it2 = EpochBatchIterator(ds, max_sentences=2, shuffle=False, num_prefetch=0)
    it2.load_state_dict(state)
    assert len(list(it2.next_epoch_itr())) == 5


def test_num_workers_parallel_loader_matches_sequential():
    ds = _ToyDataset(13)
    seq = list(EpochBatchIterator(
        ds, max_sentences=2, shuffle=False, num_prefetch=0
    ).next_epoch_itr())
    par_it = EpochBatchIterator(
        ds, max_sentences=2, shuffle=False, num_workers=4)
    par = list(par_it.next_epoch_itr())
    assert len(par) == len(seq)
    for a, b in zip(seq, par):
        np.testing.assert_array_equal(a, b)

    # resume offset semantics identical under the pool
    it = EpochBatchIterator(ds, max_sentences=2, shuffle=False, num_workers=4)
    epoch = it.next_epoch_itr()
    next(epoch), next(epoch)
    it.mark_trained(2)
    state = it.state_dict()
    assert state["offset"] == 2
    it2 = EpochBatchIterator(ds, max_sentences=2, shuffle=False, num_workers=4)
    it2.load_state_dict(state)
    rest = list(it2.next_epoch_itr())
    np.testing.assert_array_equal(rest[0], seq[2])


def test_pool_map_ordered_slow_first_item():
    # order preserved even when early jobs finish last
    import time as _t

    from diffnorm_tpu.data.iterators import pool_map_ordered

    def fn(i):
        _t.sleep(0.05 if i == 0 else 0.0)
        return i * i

    out = list(pool_map_ordered(fn, range(7), workers=3, depth=4))
    assert out == [i * i for i in range(7)]


class _ScalarSizedDataset(_ToyDataset):
    def __init__(self, sizes):
        super().__init__(len(sizes))
        self._sz = list(sizes)

    def num_tokens(self, i):
        return self._sz[i]


class _TupleSizedDataset(_ScalarSizedDataset):
    def __init__(self, sizes, tgt_sizes):
        super().__init__(sizes)
        self._tgt = list(tgt_sizes)

    def size(self, i):
        return (self._sz[i], self._tgt[i])


def test_filter_by_size_skip_and_raise():
    ds = _ScalarSizedDataset([4, 4, 9, 4, 12])
    # skip mode drops #2 and #4 with a warning
    it = EpochBatchIterator(ds, max_sentences=10, shuffle=False,
                            num_prefetch=0, max_positions=8,
                            ignore_invalid_inputs=True)
    batches = list(it.next_epoch_itr())
    np.testing.assert_array_equal(np.concatenate(batches), [0, 1, 3])
    # raise mode names the offender and the escape flag
    it2 = EpochBatchIterator(ds, max_sentences=10, shuffle=False,
                             num_prefetch=0, max_positions=8)
    with pytest.raises(ValueError, match="skip-invalid-size-inputs"):
        it2.next_epoch_itr()


def test_filter_by_size_per_component():
    # src caps and tgt caps apply to their own components (fairseq
    # SpeechToSpeechDataset.size semantics): a long SOURCE must survive a
    # target-only cap
    ds = _TupleSizedDataset(sizes=[2000, 100, 300], tgt_sizes=[50, 2000, 60])
    it = EpochBatchIterator(ds, max_sentences=10, shuffle=False,
                            num_prefetch=0, max_positions=(None, 1024),
                            ignore_invalid_inputs=True)
    batches = list(it.next_epoch_itr())
    np.testing.assert_array_equal(np.concatenate(batches), [0, 2])
    it2 = EpochBatchIterator(ds, max_sentences=10, shuffle=False,
                             num_prefetch=0, max_positions=(500, None),
                             ignore_invalid_inputs=True)
    batches = list(it2.next_epoch_itr())
    np.testing.assert_array_equal(np.concatenate(batches), [1, 2])


def test_curriculum_defers_shuffle():
    ds = _ToyDataset(12)
    it = EpochBatchIterator(ds, max_sentences=2, shuffle=True, seed=3,
                            num_prefetch=0, curriculum=1)
    first = list(it.next_epoch_itr())
    # epoch 1 <= curriculum -> in dataset order
    np.testing.assert_array_equal(np.concatenate(first), np.arange(12))
    it.finish_epoch()
    second = list(it.next_epoch_itr())
    assert not np.array_equal(np.concatenate(second), np.arange(12))


def _pyx_batch_by_size_vec(indices, num_tokens_vec, max_tokens,
                           max_sentences, bsz_mult):
    """Line-by-line transcription of the reference batch_by_size_vec
    (fairseq/data/data_utils_fast.pyx:20-105) used as the fuzz oracle —
    Cython is absent from this image, so the verbatim .pyx cannot be
    compiled; this mirrors it statement for statement."""
    if len(indices) == 0:
        return []
    n = len(indices)
    batches_ends = np.zeros(n, dtype=np.int32)
    batches_count = 0
    batch_start = 0
    tail_max_tokens = 0
    batch_max_tokens = 0
    for pos in range(n):
        tail_max_tokens = max(tail_max_tokens, int(num_tokens_vec[pos]))
        new_batch_end = pos + 1
        new_batch_max_tokens = max(batch_max_tokens, tail_max_tokens)
        new_batch_sentences = new_batch_end - batch_start
        new_batch_num_tokens = new_batch_sentences * new_batch_max_tokens
        overflow = (new_batch_sentences > max_sentences > 0 or
                    new_batch_num_tokens > max_tokens > 0)
        size_matches = (new_batch_sentences < bsz_mult or
                        new_batch_sentences % bsz_mult == 0)
        if overflow:
            tail_num_tokens = tail_max_tokens * (
                new_batch_end - batches_ends[batches_count])
            if tail_num_tokens > max_tokens > 0:
                batches_count += 1
                batches_ends[batches_count] = pos
                tail_max_tokens = int(num_tokens_vec[pos])
            batch_start = batches_ends[batches_count]
            batches_count += 1
            new_batch_max_tokens = tail_max_tokens
        if overflow or size_matches:
            batches_ends[batches_count] = new_batch_end
            batch_max_tokens = new_batch_max_tokens
            tail_max_tokens = 0
    if batches_ends[batches_count] != n:
        batches_count += 1
    return np.split(indices, batches_ends[:batches_count])


def test_batch_by_size_fuzz_matches_reference_algorithm():
    """Both the native and the python batcher reproduce the reference
    algorithm batch-for-batch on random inputs (sorted and unsorted), and
    never emit a multi-item batch that violates max_tokens/max_sentences —
    the round-1 greedy formulation did on unsorted tails (regression)."""
    rng = np.random.default_rng(0)
    from diffnorm_tpu.data.batching import _batch_by_size_py

    for trial in range(800):
        n = int(rng.integers(0, 40))
        sizes = rng.integers(1, 20, size=n).astype(np.int64)
        if rng.random() < 0.7:
            sizes = np.sort(sizes)
        indices = np.arange(n, dtype=np.int64)
        mt = int(rng.choice([0, 20, 40, 64, 100]))
        if mt and n and sizes.max() > mt:
            sizes = np.minimum(sizes, mt)
        ms = int(rng.choice([0, 2, 4, 8]))
        mult = int(rng.choice([1, 2, 8]))
        ref = [b for b in _pyx_batch_by_size_vec(indices, sizes, mt, ms, mult)
               if len(b)]
        got = batch_by_size(indices, sizes, max_tokens=mt or None,
                            max_sentences=ms or None,
                            required_batch_size_multiple=mult)
        pyb = _batch_by_size_py(indices, sizes, mt, ms, mult)
        assert len(got) == len(ref) == len(pyb), (trial, mt, ms, mult)
        for a, b, c in zip(got, ref, pyb):
            np.testing.assert_array_equal(a, b)
            np.testing.assert_array_equal(a, c)
        for b in got:
            mx = int(sizes[b].max())
            if ms:
                assert len(b) <= ms
            if mt and len(b) > 1:
                assert len(b) * mx <= mt


def test_batch_by_size_oversize_items_become_singletons():
    """Items larger than max_tokens (the reference asserts callers filter
    them; we admit them) come out as singleton batches and never corrupt
    neighboring batches."""
    sizes = np.asarray([5, 50, 5, 5, 70, 5], np.int64)
    indices = np.arange(6, dtype=np.int64)
    batches = batch_by_size(indices, sizes, max_tokens=20)
    flat = sorted(int(i) for b in batches for i in b)
    assert flat == list(range(6))
    for b in batches:
        assert len(b) > 0
        if len(b) > 1:
            assert len(b) * sizes[b].max() <= 20
    assert any(len(b) == 1 and int(sizes[b[0]]) in (50, 70) for b in batches)


def _pyx_get_slice_indices(sizes, break_mode, block_size, document_sep_len=1):
    """Transcription of the reference _get_slice_indices_fast
    (fairseq/data/token_block_utils_fast.pyx:52-106) — the fuzz oracle for
    slice_indices (Cython absent from this image)."""
    sizes = np.asarray(sizes, np.int64)
    out = []
    tok_idx = sz_idx = curr_size = 0
    if break_mode in (None, "none"):
        total_size = int(sizes.sum())
        length = math.ceil(total_size / block_size)
        return np.asarray(
            [[i * block_size, min((i + 1) * block_size, total_size)]
             for i in range(length)], np.int64).reshape(-1, 2)
    if break_mode == "complete":
        while sz_idx < len(sizes):
            if curr_size + sizes[sz_idx] <= block_size or curr_size == 0:
                curr_size += int(sizes[sz_idx])
                sz_idx += 1
            else:
                out.append((tok_idx, tok_idx + curr_size))
                tok_idx += curr_size
                curr_size = 0
        if curr_size > 0:
            out.append((tok_idx, tok_idx + curr_size))
        return np.asarray(out, np.int64).reshape(-1, 2)
    if break_mode == "complete_doc":
        while sz_idx < len(sizes):
            if ((curr_size + sizes[sz_idx] <= block_size or curr_size == 0)
                    and sizes[sz_idx] != document_sep_len):
                curr_size += int(sizes[sz_idx])
                sz_idx += 1
            else:
                if curr_size > 1:
                    out.append((tok_idx, tok_idx + curr_size))
                tok_idx += curr_size
                curr_size = 0
                if sizes[sz_idx] == document_sep_len:
                    tok_idx += int(sizes[sz_idx])
                    sz_idx += 1
        if curr_size > 1:
            out.append((tok_idx, tok_idx + curr_size))
        return np.asarray(out, np.int64).reshape(-1, 2)
    if break_mode == "eos":
        cumsum = np.concatenate([[0], np.cumsum(sizes)])
        return np.stack([cumsum[:-1], cumsum[1:]], axis=1)
    raise ValueError(break_mode)


def test_slice_indices_all_break_modes_match_reference_algorithm():
    from diffnorm_tpu.data.unit_lm_dataset import slice_indices

    rng = np.random.default_rng(0)
    for trial in range(300):
        n = int(rng.integers(1, 30))
        sizes = rng.integers(1, 12, size=n).astype(np.int64)
        if rng.random() < 0.3:  # sprinkle document separators (size 1)
            sizes[rng.random(n) < 0.2] = 1
        block = int(rng.choice([4, 8, 16, 64]))
        for mode in ("none", "complete", "complete_doc", "eos"):
            ref = _pyx_get_slice_indices(sizes, mode, block)
            got = slice_indices(sizes, mode, block)
            np.testing.assert_array_equal(got, ref), (trial, mode, block)


def test_unit_lm_dataset_token_blocking_modes():
    from diffnorm_tpu.data.unit_lm_dataset import UnitLMDataset

    seqs = [np.arange(4, 4 + k, dtype=np.int32) for k in (3, 5, 2, 7, 1)]
    flat = np.concatenate(seqs)
    # none: fixed 6-token windows across boundaries
    ds = UnitLMDataset([s.copy() for s in seqs], block_size=6,
                       break_mode="none")
    np.testing.assert_array_equal(np.concatenate(ds.unit_seqs), flat)
    assert all(len(u) == 6 for u in ds.unit_seqs[:-1])
    # complete: whole sequences grouped up to 8 tokens (an oversize group
    # only forms when a single sequence exceeds the block)
    ds = UnitLMDataset([s.copy() for s in seqs], block_size=8,
                       break_mode="complete")
    assert [len(u) for u in ds.unit_seqs] == [8, 2, 8]
    np.testing.assert_array_equal(np.concatenate(ds.unit_seqs), flat)
    # eos: one sequence per block
    ds = UnitLMDataset([s.copy() for s in seqs], block_size=6,
                       break_mode="eos")
    assert [len(u) for u in ds.unit_seqs] == [3, 5, 2, 7, 1]
