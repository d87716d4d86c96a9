"""AR generation extras (fairseq sequence_generator parity): ancestral
sampling (--sampling, --sampling-topk/topp, --temperature), forced target
prefixes (--prefix-size), and reference scoring (--score-reference)."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnorm_tpu.config import Config
from diffnorm_tpu.generate.beam_search import ar_generate
from diffnorm_tpu.registry import TASKS

PAD, BOS, EOS, UNK = 1, 0, 2, 3

AR_CFG = dict(
    arch="s2ut_conformer", criterion="label_smoothed_cross_entropy",
    encoder_layers=1, decoder_layers=1, encoder_embed_dim=32,
    encoder_ffn_embed_dim=64, encoder_attention_heads=2,
    decoder_attention_heads=2, decoder_embed_dim=32,
    decoder_ffn_embed_dim=64, conv_channels=32,
    depthwise_conv_kernel_size=7, target_code_size=20,
    label_smoothing=0.1, lr=5e-4,
)


@pytest.fixture(scope="module")
def built():
    cfg = Config(**AR_CFG)
    task = TASKS.get("dummy_ar").setup_task(cfg)
    model = task.build_model()
    batch = task.dummy_batch(2, 24)
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    return task, model, batch, variables


def test_prefix_tokens_forced(built):
    task, model, batch, variables = built
    src, lens = batch["src_tokens"], batch["src_lengths"]
    prefix = jnp.asarray([[7, 8], [9, 10]], jnp.int32)
    seqs, scores = ar_generate(
        model, variables, src, lens, beam_size=2, max_len=12,
        prefix_tokens=prefix,
    )
    # every beam of every sentence starts with the forced prefix
    np.testing.assert_array_equal(
        np.asarray(seqs[:, :, :2]),
        np.broadcast_to(np.asarray(prefix)[:, None, :], (2, 2, 2)),
    )
    # pad rows in the prefix are unconstrained (no crash, valid output)
    prefix_pad = jnp.asarray([[7, PAD], [9, PAD]], jnp.int32)
    seqs2, _ = ar_generate(model, variables, src, lens, beam_size=1,
                           max_len=12, prefix_tokens=prefix_pad)
    assert int(seqs2[0, 0, 0]) == 7 and int(seqs2[1, 0, 0]) == 9


def test_sampling_decode(built):
    task, model, batch, variables = built
    src, lens = batch["src_tokens"], batch["src_lengths"]
    kw = dict(beam_size=2, max_len=12, sampling=True, temperature=0.8)
    s1, sc1 = ar_generate(model, variables, src, lens,
                          rng=jax.random.PRNGKey(3), **kw)
    s1b, _ = ar_generate(model, variables, src, lens,
                         rng=jax.random.PRNGKey(3), **kw)
    s2, _ = ar_generate(model, variables, src, lens,
                        rng=jax.random.PRNGKey(4), **kw)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s1b))  # seeded
    assert s1.shape == (2, 2, 12)
    assert np.all(np.asarray(s1) >= 0)
    # scores sorted best-first per sentence
    assert np.all(np.diff(np.asarray(sc1), axis=1) <= 1e-6)


def test_sampling_topk_restricts_support(built):
    task, model, batch, variables = built
    src, lens = batch["src_tokens"], batch["src_lengths"]
    # topk=1 sampling is greedy: must match across seeds
    a, _ = ar_generate(model, variables, src, lens, beam_size=1, max_len=10,
                       sampling=True, sampling_topk=1,
                       rng=jax.random.PRNGKey(0))
    b, _ = ar_generate(model, variables, src, lens, beam_size=1, max_len=10,
                       sampling=True, sampling_topk=1,
                       rng=jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sampling_topp_runs(built):
    task, model, batch, variables = built
    src, lens = batch["src_tokens"], batch["src_lengths"]
    s, _ = ar_generate(model, variables, src, lens, beam_size=1, max_len=10,
                       sampling=True, sampling_topp=0.5,
                       rng=jax.random.PRNGKey(0))
    assert s.shape == (2, 1, 10)


CLI_COMMON = [
    sys.executable, "-m", "diffnorm_tpu.cli.generate", "--cpu",
    "--task", "dummy_ar", "--arch", "s2ut_conformer",
    "--criterion", "label_smoothed_cross_entropy",
    "--encoder-layers", "1", "--decoder-layers", "1",
    "--encoder-embed-dim", "32", "--encoder-ffn-embed-dim", "64",
    "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
    "--target-code-size", "16", "--batch-size", "2",
    "--tokens-per-sample", "10", "--dataset-size", "2",
    "--max-target-positions", "16",
]


@pytest.mark.slow
def test_cli_score_reference(tmp_path):
    out = subprocess.run(
        CLI_COMMON + ["--score-reference",
                      "--results-path", str(tmp_path)],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = (tmp_path / "generate-test.txt").read_text().splitlines()
    t = {l.split("\t")[0][2:]: l.split("\t")[1] for l in lines
         if l.startswith("T-")}
    h = {l.split("\t")[0][2:]: l.split("\t") for l in lines
         if l.startswith("H-")}
    assert t and h
    for sid, ref in t.items():
        score, hyp = float(h[sid][1]), h[sid][2]
        assert hyp == ref  # hypothesis IS the reference
        assert np.isfinite(score) and score <= 0.0  # a log-prob


@pytest.mark.slow
def test_cli_sampling(tmp_path):
    out = subprocess.run(
        CLI_COMMON + ["--sampling", "--sampling-topk", "3",
                      "--temperature", "0.9", "--beam", "2",
                      "--results-path", str(tmp_path)],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    txt = (tmp_path / "generate-test.txt").read_text()
    assert "H-" in txt


def test_sampling_honors_prefix_and_ngram(built):
    """--sampling composes with --prefix-size and --no-repeat-ngram-size
    (fairseq applies _prefix_tokens and repeat blocking before search.step
    for every strategy including Sampling)."""
    task, model, batch, variables = built
    src, lens = batch["src_tokens"], batch["src_lengths"]
    prefix = jnp.asarray([[7, 8], [9, 10]], jnp.int32)
    seqs, _ = ar_generate(
        model, variables, src, lens, beam_size=2, max_len=12,
        sampling=True, temperature=0.8, no_repeat_ngram=2,
        prefix_tokens=prefix, rng=jax.random.PRNGKey(5),
    )
    # every sampled hypothesis of every sentence starts with the prefix
    np.testing.assert_array_equal(
        np.asarray(seqs[:, :, :2]),
        np.broadcast_to(np.asarray(prefix)[:, None, :], (2, 2, 2)),
    )


def test_to_variables_handles_trainstate():
    """--rerank-path / --path accept both raw variables dicts and this
    repo's TrainState checkpoints (step/params/opt_state/frozen_params/
    model_state) — the latter must fold frozen subtrees back into params
    and surface model_state collections."""
    from diffnorm_tpu.cli.generate import _to_variables

    ts = {"step": 3, "params": {"a": 1}, "opt_state": {"mu": 0},
          "frozen_params": {"vae": 2}, "model_state": {"batch_stats": {"b": 3}}}
    assert _to_variables(ts) == {"params": {"a": 1, "vae": 2},
                                 "batch_stats": {"b": 3}}
    raw = {"params": {"a": 1}}
    assert _to_variables(raw) is raw
    assert _to_variables({"a": 1}) is None  # unrecognized -> caller decides
