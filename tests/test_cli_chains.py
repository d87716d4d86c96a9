"""Train -> checkpoint -> consume chains through the REAL CLI mains for
every secondary model family (the flagship NAR chain lives in
test_pipeline_e2e.py). The reference exercises these seams in
tests/test_binaries.py by running fairseq_cli.train + generate per arch;
the checkpoint-canonicalization seam (TrainState vs raw variables) is
exactly where chain bugs hide (see restored_to_variables).

All chains run tiny models on CPU and are slow-marked.
"""

import os

import numpy as np
import pytest

from diffnorm_tpu.config import Config

pytestmark = pytest.mark.slow


def _train(tmp_path, name, **cfg):
    from diffnorm_tpu.cli import train

    save_dir = str(tmp_path / f"ckpt_{name}")
    rc = train.main(Config(
        save_dir=save_dir, cpu=True, batch_size=2, lr=1e-3,
        warmup_updates=2, log_interval=1, max_updates=2,
        keep_last_epochs=1, keep_best_checkpoints=1, seed=3,
        dataset_size=4, tokens_per_sample=10, **cfg,
    ))
    assert rc == 0
    ckpts = sorted(d for d in os.listdir(save_dir)
                   if d.startswith("step_") and not d.endswith(".json")
                   and "tmp" not in d)
    assert ckpts, os.listdir(save_dir)
    return os.path.join(save_dir, ckpts[-1])


AR_CFG = dict(
    task="dummy_ar", arch="s2ut_conformer",
    criterion="label_smoothed_cross_entropy",
    encoder_layers=1, decoder_layers=1, encoder_embed_dim=32,
    encoder_ffn_embed_dim=64, encoder_attention_heads=2,
    decoder_attention_heads=2, target_code_size=16, label_smoothing=0.1,
)


def _generate(tmp_path, ckpt, results_name, **cfg):
    from diffnorm_tpu.cli import generate

    results = str(tmp_path / results_name)
    rc = generate.main(Config(
        path=ckpt, results_path=results, cpu=True, batch_size=2,
        dataset_size=4, tokens_per_sample=10, max_target_positions=16,
        **cfg,
    ))
    assert rc == 0
    txt = open(os.path.join(results, "generate-test.txt")).read()
    assert "H-" in txt and "T-" in txt
    return txt


def test_ar_train_generate_chain(tmp_path):
    """AR S2UT: train -> beam decode from the saved TrainState; then the
    same checkpoint through --sampling (distinct per-batch RNG path)."""
    ckpt = _train(tmp_path, "ar", **AR_CFG)
    _generate(tmp_path, ckpt, "beam", beam=2, **AR_CFG)
    _generate(tmp_path, ckpt, "samp", beam=2, sampling=True,
              sampling_topk=3, temperature=0.9, **AR_CFG)


def test_levenshtein_train_generate_chain(tmp_path):
    cfg = dict(
        task="dummy_lev", arch="levenshtein_transformer",
        criterion="levenshtein_loss",
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
        decoder_layers=1, encoder_attention_heads=2, target_code_size=20,
        src_vocab_size=24, label_smoothing=0.1,
    )
    ckpt = _train(tmp_path, "lev", **cfg)
    _generate(tmp_path, ckpt, "lev", iter_decode_max_iter=2, **cfg)


def test_cmlm_text_train_generate_chain(tmp_path):
    """CMLM-CG text MT: train -> mask-predict decode with CG + length beam."""
    cfg = dict(
        task="dummy_cmlm_cg", arch="cmlm_transformer",
        criterion="nar_speech_to_unit",
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
        decoder_layers=1, encoder_attention_heads=2, target_code_size=20,
        src_vocab_size=24, cg_prob=0.1, label_smoothing=0.1,
    )
    ckpt = _train(tmp_path, "cmlm", **cfg)
    _generate(tmp_path, ckpt, "cmlm", iter_decode_max_iter=2,
              iter_decode_with_beam=2, cond_scale=1.5, **cfg)


def test_unit_lm_train_eval_lm_chain(tmp_path, capsys):
    from diffnorm_tpu.cli import eval_lm

    cfg = dict(
        task="dummy_unit_lm", arch="transformer_lm",
        criterion="lm_cross_entropy",
        decoder_embed_dim=32, decoder_ffn_embed_dim=64, decoder_layers=1,
        decoder_attention_heads=2, target_code_size=16,
    )
    ckpt = _train(tmp_path, "lm", **cfg)
    rc = eval_lm.main(Config(path=ckpt, cpu=True, batch_size=2,
                             dataset_size=4, tokens_per_sample=10, **cfg))
    assert rc == 0
    out = capsys.readouterr().out
    assert "Perplexity:" in out
    ppl = float(out.rsplit("Perplexity:", 1)[1].strip())
    assert np.isfinite(ppl) and ppl > 1.0


def test_sedd_train_validate_chain(tmp_path):
    from diffnorm_tpu.cli import validate

    cfg = dict(
        task="dummy_sedd", arch="sedd_absorb", criterion="sedd_loss",
        sedd_dim=16, sedd_depth=1, sedd_heads=2, target_code_size=12,
    )
    ckpt = _train(tmp_path, "sedd", **cfg)
    rc = validate.main(Config(path=ckpt, cpu=True, batch_size=2,
                              dataset_size=4, tokens_per_sample=10,
                              valid_subset="dev", **cfg))
    assert rc == 0


def test_cmlm_interactive_chain(tmp_path, monkeypatch, capsys):
    """interactive.py: text-token stdin -> mask-predict -> H- lines, with
    the checkpoint restored through the shared canonicalization."""
    import io

    from diffnorm_tpu.cli import interactive

    cfg = dict(
        task="dummy_cmlm_cg", arch="cmlm_transformer",
        criterion="nar_speech_to_unit",
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
        decoder_layers=1, encoder_attention_heads=2, target_code_size=20,
        src_vocab_size=24, cg_prob=0.1, label_smoothing=0.1,
    )
    ckpt = _train(tmp_path, "cmlm_i", **cfg)
    monkeypatch.setattr("sys.stdin", io.StringIO("5 7 9\n3 4\n"))
    rc = interactive.main(Config(path=ckpt, cpu=True,
                                 iter_decode_max_iter=2,
                                 max_target_positions=16, **cfg))
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("H-") == 2
