"""Translatotron2 two-pass speech-to-spectrogram S2ST
(models/s2spect2.py + generate/translatotron2.py).

Reference surface: S2SpecT2ConformerModel
(fairseq/models/speech_to_speech/s2s_conformer_translatotron2.py), the
speech_to_spectrogram_2pass criterion
(fairseq/criterions/speech_to_speech_criterion.py:434-520), and the
two-pass MultiDecoderSpeechGenerator (fairseq/speech_generator.py:129-320).
"""

import os

import jax
import numpy as np
import pytest
import yaml

from diffnorm_tpu.config import Config
from diffnorm_tpu.data.manifest import write_translation_manifest
from diffnorm_tpu.registry import ARCHITECTURES, TASKS

PAD, BOS, EOS, UNK = 1, 0, 2, 3
MEL_DIM = 6


@pytest.fixture(scope="module")
def t2_data_dir(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("t2data")
    rng = np.random.default_rng(0)
    for split, n in (("train", 4), ("test", 2)):
        rows = []
        for i in range(n):
            t = int(rng.integers(36, 56))
            src = rng.normal(size=(t, 80)).astype(np.float32)
            np.save(tmp_path / f"{split}{i}_s.npy", src)
            mel = rng.normal(size=(t // 2 + 4, MEL_DIM)).astype(np.float32)
            np.save(tmp_path / f"{split}{i}_t.npy", mel)
            rows.append({
                "id": f"{split}{i}",
                "src_audio": str(tmp_path / f"{split}{i}_s.npy"),
                "src_n_frames": t,
                "tgt_audio": str(tmp_path / f"{split}{i}_t.npy"),
                "tgt_n_frames": mel.shape[0],
            })
        write_translation_manifest(str(tmp_path / f"{split}.tsv"), rows)
    (tmp_path / "config.yaml").write_text(yaml.safe_dump({
        "input_feat_per_channel": 80,
    }))

    letters = [chr(ord("a") + k) for k in range(6)]
    dict_path = tmp_path / "dict.letters.txt"
    dict_path.write_text("".join(f"{w} 1\n" for w in letters))

    for task_name in ("source_unigram", "target_letter"):
        d = tmp_path / task_name
        d.mkdir()
        for split, n in (("train", 4), ("test", 2)):
            with open(d / f"{split}.tsv", "w") as f:
                f.write("id\ttgt_text\n")
                for i in range(n):
                    txt = " ".join(
                        rng.choice(letters, size=int(rng.integers(3, 7))))
                    f.write(f"{split}{i}\t{txt}\n")

    (tmp_path / "multitask.yaml").write_text(yaml.safe_dump({
        # aux encoder-tapped CTC head, kept to prove the remaining tasks
        # still attach alongside the first-pass decoder
        "source_unigram": {
            "decoder_type": "ctc",
            "dict": str(dict_path),
            "data": str(tmp_path / "source_unigram"),
            "loss_weight": 8.0,
        },
        # the first-pass MT decoder task (reference
        # s2s_conformer_translatotron2.py:157 selects it via
        # task_obj.is_first_pass_decoder)
        "target_letter": {
            "decoder_type": "transformer",
            "dict": str(dict_path),
            "data": str(tmp_path / "target_letter"),
            "is_first_pass_decoder": True,
            "loss_weight": 1.0,
            "decoder_args": {"dropout": 0.1},
        },
    }))
    return tmp_path


def _t2_cfg(data_dir, **kw):
    cfg = Config(
        arch="s2spect2_conformer", criterion="speech_to_spectrogram_2pass",
        data=str(data_dir), multitask_config_yaml="multitask.yaml",
        encoder_layers=2, encoder_embed_dim=16, encoder_ffn_embed_dim=32,
        encoder_attention_heads=2, decoder_embed_dim=16,
        decoder_ffn_embed_dim=32, decoder_transformer_layers=2,
        decoder_attention_heads=2, conv_channels=16,
        depthwise_conv_kernel_size=7, translation_decoder_layers=2,
        synthesizer_encoder_layers=1, prenet_dim=8, postnet_conv_dim=8,
        postnet_layers=2, output_frame_dim=MEL_DIM, lr=5e-4,
    )
    cfg.update(**kw)
    return cfg


@pytest.fixture(scope="module")
def t2_built(t2_data_dir):
    cfg = _t2_cfg(t2_data_dir)
    # --target-is-code absent -> spectrogram task (reference
    # speech_to_speech.py add_args default False)
    task = TASKS.get("speech_to_speech").setup_task(cfg)
    ds = task.dataset("train")
    batch = ds.collater([ds[i] for i in range(4)])
    batch = task.prepare_batch(batch, np.random.default_rng(0))
    model = task.build_model()
    crit = task.build_criterion()
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    return task, model, crit, batch, variables


def test_first_pass_task_selected(t2_built):
    task, model = t2_built[0], t2_built[1]
    assert task.mt_task_name == "target_letter"
    assert model.module.mt_task_name == "target_letter"
    # the first-pass task's decoder IS the mt_decoder; only source_unigram
    # attaches as an aux head
    assert [s.name for s in model.module.multitask] == ["source_unigram"]


def test_two_pass_forward_shapes(t2_built):
    task, model, crit, batch, variables = t2_built
    mt_prev = batch["multitask"]["target_letter"]["prev_output_tokens"]
    out = model.apply(
        variables, batch["src_tokens"], batch["src_lengths"],
        batch["prev_feats"], batch["tgt_mask"],
        prev_tokens_mt=mt_prev, tgt_tokens=batch["feat_tgt"],
        multitask_prev=task.multitask_prev(batch), deterministic=True,
        # the Tacotron prenet applies dropout even when deterministic
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert out["post_feat"].shape == batch["feat_tgt"].shape
    assert out["feat"].shape == batch["feat_tgt"].shape
    assert out["eos_logits"].shape == batch["tgt_mask"].shape
    # first-pass decoder logits arrive through the multitask dict so the
    # standard aux accounting prices them (reference reuses mt_decoder_out,
    # speech_to_speech_criterion.py:478-504)
    mt_logits = out["multitask"]["target_letter"]["logits"]
    assert mt_logits.shape == (*mt_prev.shape, 6 + 4)
    b = batch["src_tokens"].shape[0]
    enc_t = int(np.asarray(
        out["multitask"]["source_unigram"]["mask"]).shape[1])
    assert out["multitask"]["source_unigram"]["logits"].shape == (
        b, enc_t, 6 + 4)


def test_2pass_criterion_prices_both_passes(t2_built):
    task, model, crit, batch, variables = t2_built
    loss, mets, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                         train=True)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(mets["multitask_target_letter_loss"]))
    assert np.isfinite(float(mets["multitask_source_unigram_loss"]))

    import copy

    zeroed = copy.deepcopy(batch)
    zeroed["multitask"]["target_letter"]["loss_weight"] = np.float32(0.0)
    zeroed["multitask"]["source_unigram"]["loss_weight"] = np.float32(0.0)
    loss0, mets0, _ = crit(model, variables, zeroed, jax.random.PRNGKey(1),
                           train=False)
    lossw, _, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                       train=False)
    assert float(lossw) > float(loss0)
    # the Tacotron mel losses are still present with aux weights zeroed
    assert np.isfinite(float(mets0["l1_loss"]))


def test_synthesizer_encoder_optional(t2_data_dir):
    """synthesizer_encoder_layers=0 skips the text encoder (reference
    forward :210-221 falls back to identity)."""
    cfg = _t2_cfg(t2_data_dir, synthesizer_encoder_layers=0)
    task = TASKS.get("speech_to_speech").setup_task(cfg)
    model = task.build_model()
    ds = task.dataset("train")
    batch = ds.collater([ds[0], ds[1]])
    batch = task.prepare_batch(batch, np.random.default_rng(0))
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    assert "synthesizer_encoder" not in variables["params"]
    crit = task.build_criterion()
    loss, _, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                      train=False)
    assert np.isfinite(float(loss))


def test_translatotron2_generate_two_pass(t2_built):
    from diffnorm_tpu.generate.translatotron2 import translatotron2_generate

    task, model, crit, batch, variables = t2_built
    b = batch["src_tokens"].shape[0]
    feat, out_lens, eos_prob, mt_best = translatotron2_generate(
        model, variables, batch["src_tokens"], batch["src_lengths"],
        beam_size_mt=2, max_len_mt=12, max_iter=8)
    assert np.asarray(feat).shape == (b, 8, MEL_DIM)
    assert np.asarray(eos_prob).shape == (b, 8)
    out_lens = np.asarray(out_lens)
    assert (out_lens >= 1).all() and (out_lens <= 8).all()
    mt_best = np.asarray(mt_best)
    assert mt_best.shape == (b, 12)
    # first-pass tokens come from the text vocab (6 letters + specials)
    assert (mt_best < 10).all()
    # finished hypotheses terminate with EOS then PADs
    for i in range(b):
        row = mt_best[i]
        if (row == EOS).any():
            e = int(np.argmax(row == EOS))
            assert (row[e + 1:] == PAD).all()


def test_translatotron2_generator_wrapper(t2_built):
    from diffnorm_tpu.generate.translatotron2 import (
        Translatotron2SpeechGenerator,
    )

    task, model, crit, batch, variables = t2_built
    gen = Translatotron2SpeechGenerator(
        model, variables, max_iter=8, beam_size_mt=2, max_len_mt=12)
    entries = gen.generate(batch["src_tokens"], batch["src_lengths"])
    assert len(entries) == batch["src_tokens"].shape[0]
    for e in entries:
        assert e["feature"].shape[1] == MEL_DIM
        assert e["feature"].shape[0] == e["eos_prob"].shape[0] >= 1
        assert PAD not in e["mt_tokens"] and EOS not in e["mt_tokens"]


def test_t2_train_step(t2_data_dir):
    """One jitted trainer step through both passes' grad path."""
    from diffnorm_tpu.config import make_trainer_config
    from diffnorm_tpu.train.trainer import Trainer

    cfg = _t2_cfg(t2_data_dir, warmup_updates=10)
    task = TASKS.get("speech_to_speech").setup_task(cfg)
    ds = task.dataset("train")
    batch = ds.collater([ds[i] for i in range(2)])
    batch = task.prepare_batch(batch, np.random.default_rng(0))
    trainer = Trainer(make_trainer_config(cfg), task, task.build_model(),
                      task.build_criterion())
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, mets = trainer.train_step(state, [batch], jax.random.PRNGKey(1))
    assert np.isfinite(mets["loss"])
    assert np.isfinite(mets["multitask_target_letter_loss"])


def test_arch_names_registered():
    assert ARCHITECTURES.get("s2spect2_conformer")
    # reference registers the same model under a legacy arch name
    assert ARCHITECTURES.get("s2spect_conformer_translatotron2")


@pytest.mark.slow
def test_t2_train_generate_chain(t2_data_dir, tmp_path):
    """Full CLI chain: train the two-pass model -> two-pass synthesis from
    the saved checkpoint (mel .npy per utterance + MT- text log lines)."""
    from diffnorm_tpu.cli import generate, train

    save_dir = str(tmp_path / "ckpt_t2")
    common = dict(
        task="speech_to_speech",
        **{k: v for k, v in _t2_cfg(t2_data_dir).items()},
    )
    rc = train.main(Config(
        save_dir=save_dir, cpu=True, batch_size=2, warmup_updates=2,
        log_interval=1, max_updates=2, keep_last_epochs=1,
        keep_best_checkpoints=1, seed=3, **common,
    ))
    assert rc == 0
    ckpts = sorted(d for d in os.listdir(save_dir)
                   if d.startswith("step_") and not d.endswith(".json")
                   and "tmp" not in d)
    assert ckpts, os.listdir(save_dir)
    ckpt = os.path.join(save_dir, ckpts[-1])

    results = str(tmp_path / "t2_gen")
    rc = generate.main(Config(
        path=ckpt, results_path=results, cpu=True, batch_size=2,
        gen_subset="test", beam_mt=2, max_len_b_mt=12,
        max_target_positions=8, **common,
    ))
    assert rc == 0
    outs = [f for f in os.listdir(results) if f.endswith(".npy")]
    assert len(outs) == 2, os.listdir(results)
    feat = np.load(os.path.join(results, outs[0]))
    assert feat.ndim == 2 and feat.shape[1] == MEL_DIM
