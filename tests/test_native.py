"""Native C++ helpers: BLEU counters, batched edit distance, token blocks."""

import ctypes

import numpy as np
import pytest

from diffnorm_tpu.data.batching import _load_native


@pytest.fixture(scope="module")
def lib():
    lib = _load_native()
    if not lib:
        pytest.skip("native lib not built (make -C csrc)")
    lib.bleu_stat_size.restype = ctypes.c_long
    lib.edit_distance_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.token_block_slices.argtypes = [
        ctypes.POINTER(ctypes.c_long), ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.token_block_slices.restype = ctypes.c_long
    return lib


def _bleu_counts(lib, ref, hyp):
    stat = ctypes.create_string_buffer(lib.bleu_stat_size())
    lib.bleu_zero(stat)
    r = np.asarray(ref, np.int32)
    h = np.asarray(hyp, np.int32)
    lib.bleu_add(
        stat,
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(r),
        h.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(h),
        ctypes.c_int(1), ctypes.c_int(2),
    )
    out = np.zeros(10, np.int64)
    lib.bleu_counts(stat, out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
    return out  # reflen, predlen, (match, total) x 4


def test_bleu_perfect_match(lib):
    out = _bleu_counts(lib, [5, 6, 7, 8], [5, 6, 7, 8])
    assert out[0] == out[1] == 4
    np.testing.assert_array_equal(out[2:], [4, 4, 3, 3, 2, 2, 1, 1])


def test_bleu_clipping(lib):
    # hyp repeats a unigram more often than ref contains it
    out = _bleu_counts(lib, [5, 6], [5, 5, 5])
    assert out[2] == 1 and out[3] == 3  # clipped unigram matches


def test_bleu_strips_pad_eos(lib):
    out = _bleu_counts(lib, [5, 6, 2, 1, 1], [5, 6, 2])
    assert out[0] == 2 and out[1] == 2


def test_edit_distance(lib):
    refs = np.asarray([[5, 6, 7, 1], [5, 5, 5, 5]], np.int32)
    hyps = np.asarray([[5, 7, 1, 1], [1, 1, 1, 1]], np.int32)
    out = np.zeros(2, np.int64)
    lib.edit_distance_batch(
        refs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        hyps.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        2, 4, 4, 1,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    assert out[0] == 1  # delete '6'
    assert out[1] == 4  # delete everything


def test_token_block_slices(lib):
    sizes = np.asarray([5, 3, 7], np.int64)  # total 15
    slices = np.zeros(4 * 4, np.int64)
    n = lib.token_block_slices(
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), 3, 6,
        slices.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    assert n == 3
    s = slices[:12].reshape(3, 4)
    # block 0: docs 0..1 offset 1 (5 from doc0 + 1 from doc1)
    np.testing.assert_array_equal(s[0], [0, 0, 1, 1])
    np.testing.assert_array_equal(s[1], [1, 1, 2, 4])
    np.testing.assert_array_equal(s[2], [2, 4, 3, 0])
