"""--multitask-config-yaml auxiliary tasks.

Reference surface: MultitaskConfig/SingleTaskConfig (data_cfg.py:244-387),
TextTargetMultitaskData (speech_to_text_dataset.py:393-480), the aux decoders
built by S2STransformerMultitaskModelBase (s2s_transformer.py:171-230), and
MultitaskCriterion loss accounting (research/TranSpeech/criterion.py:22-123).
"""

import os

import jax
import numpy as np
import pytest
import yaml

from diffnorm_tpu.config import Config
from diffnorm_tpu.data.dictionary import Dictionary
from diffnorm_tpu.data.manifest import write_translation_manifest
from diffnorm_tpu.data.multitask import (
    MultitaskConfig,
    SingleTaskConfig,
    TextTargetData,
    collate_text_targets,
)
from diffnorm_tpu.registry import TASKS

PAD, BOS, EOS, UNK = 1, 0, 2, 3


# --------------------------------------------------------------------------
# config parsing / loss-weight schedule
# --------------------------------------------------------------------------

def test_loss_weight_fixed_and_decay():
    fixed = SingleTaskConfig("t", {"loss_weight": 8.0})
    assert fixed.loss_weight_schedule == "fixed"
    assert fixed.get_loss_weight(0) == 8.0
    assert fixed.get_loss_weight(10_000) == 8.0

    # reference data_cfg.py:339-355 linear decay
    dec = SingleTaskConfig("t", {
        "loss_weight_max": 1.0,
        "loss_weight_decay_steps": 100,
        "loss_weight_min": 0.1,
    })
    assert dec.loss_weight_schedule == "decay"
    step = (1.0 - 0.1) / 100
    assert dec.get_loss_weight(0) == pytest.approx(1.0)
    assert dec.get_loss_weight(50) == pytest.approx(1.0 - 50 * step)
    assert dec.get_loss_weight(100) == pytest.approx(0.1)
    assert dec.get_loss_weight(10_000) == pytest.approx(0.1)  # clamped


def test_input_layer_indexing():
    # encoder_layer: k is 1-based; absent -> -1 (final layer)
    assert SingleTaskConfig("t", {}).input_from == "encoder"
    assert SingleTaskConfig("t", {}).input_layer == -1
    assert SingleTaskConfig("t", {"encoder_layer": 2}).input_layer == 1
    dec = SingleTaskConfig("t", {"decoder_layer": 3})
    assert dec.input_from == "decoder"
    assert dec.input_layer == 2


def test_first_pass_decoder_selection(tmp_path):
    y = tmp_path / "mt.yaml"
    y.write_text(yaml.safe_dump({
        "source_ctc": {"decoder_type": "ctc"},
        "target_letter": {"decoder_type": "transformer"},
    }))
    cfg = MultitaskConfig(str(y))
    # last 'target*' transformer task wins when no explicit flag
    assert cfg.first_pass_decoder_task_index == 1


def test_collate_text_targets_move_eos_to_beginning():
    # fairseq collate_tokens(move_eos_to_beginning=True): prev[0] = the true
    # final token, prev[1:n] = tgt[:n-1]
    t0 = np.array([5, 6, 7, EOS], np.int32)
    t1 = np.array([8, EOS], np.int32)
    out = collate_text_targets([t0, t1])
    np.testing.assert_array_equal(out["target"][0], [5, 6, 7, EOS])
    np.testing.assert_array_equal(out["target"][1], [8, EOS, PAD, PAD])
    np.testing.assert_array_equal(out["prev_output_tokens"][0], [EOS, 5, 6, 7])
    np.testing.assert_array_equal(out["prev_output_tokens"][1], [EOS, 8, PAD, PAD])
    assert out["ntokens"] == 6
    np.testing.assert_array_equal(out["target_lengths"], [4, 2])


# --------------------------------------------------------------------------
# end-to-end: dataset join -> model aux heads -> criterion
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mt_data_dir(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("mtdata")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        t = int(rng.integers(36, 56))
        feat = rng.normal(size=(t, 80)).astype(np.float32)
        np.save(tmp_path / f"utt{i}.npy", feat)
        units = rng.integers(0, 10, size=t // 4 + 2)
        rows.append({
            "id": f"utt{i}", "src_audio": str(tmp_path / f"utt{i}.npy"),
            "src_n_frames": t, "tgt_audio": " ".join(map(str, units)),
            "tgt_n_frames": len(units),
        })
    write_translation_manifest(str(tmp_path / "train.tsv"), rows)
    (tmp_path / "config.yaml").write_text(yaml.safe_dump({
        "input_feat_per_channel": 80,
    }))

    # shared letter dictionary for both aux tasks
    letters = [chr(ord("a") + k) for k in range(6)]
    dict_path = tmp_path / "dict.letters.txt"
    dict_path.write_text("".join(f"{w} 1\n" for w in letters))

    # per-task text-target dirs
    for task_name in ("source_unigram", "target_letter", "decoder_ctc"):
        d = tmp_path / task_name
        d.mkdir()
        with open(d / "train.tsv", "w") as f:
            f.write("id\ttgt_text\n")
            for i in range(4):
                txt = " ".join(
                    rng.choice(letters, size=int(rng.integers(3, 7))))
                f.write(f"utt{i}\t{txt}\n")

    (tmp_path / "multitask.yaml").write_text(yaml.safe_dump({
        # encoder-tapped CTC aux head (reference source_unigram style)
        "source_unigram": {
            "decoder_type": "ctc",
            "dict": str(dict_path),
            "data": str(tmp_path / "source_unigram"),
            "loss_weight": 8.0,
        },
        # transformer aux decoder over encoder states with a decay schedule
        "target_letter": {
            "decoder_type": "transformer",
            "dict": str(dict_path),
            "data": str(tmp_path / "target_letter"),
            "encoder_layer": 1,
            "loss_weight_max": 1.0,
            "loss_weight_decay_steps": 10,
            "loss_weight_min": 0.1,
            "decoder_args": {
                "decoder_layers": 1, "decoder_embed_dim": 16,
                "decoder_attention_heads": 2, "decoder_ffn_embed_dim": 32,
                "dropout": 0.1,
            },
        },
        # decoder-tapped CTC (reference criterion.py:62-67 inner_states)
        "decoder_ctc": {
            "decoder_type": "ctc",
            "dict": str(dict_path),
            "data": str(tmp_path / "decoder_ctc"),
            "decoder_layer": 2,
            "loss_weight": 1.0,
        },
    }))
    return tmp_path


def _mt_cfg(data_dir, **kw):
    cfg = Config(
        arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
        data=str(data_dir), multitask_config_yaml="multitask.yaml",
        encoder_layers=2, decoder_layers=2, encoder_embed_dim=32,
        encoder_ffn_embed_dim=64, encoder_attention_heads=2,
        decoder_attention_heads=2, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, conv_channels=32,
        depthwise_conv_kernel_size=7, target_code_size=10,
        label_smoothing=0.2, lr=5e-4,
    )
    cfg.update(**kw)
    return cfg


@pytest.fixture(scope="module")
def mt_built(mt_data_dir):
    cfg = _mt_cfg(mt_data_dir)
    task = TASKS.get("speech_to_speech_fasttranslate").setup_task(cfg)
    ds = task.dataset("train")
    batch = ds.collater([ds[i] for i in range(4)])
    batch = task.prepare_batch(batch, np.random.default_rng(0))
    model = task.build_model()
    crit = task.build_criterion()
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    return task, model, crit, batch, variables


def test_aux_task_specs(mt_built):
    task = mt_built[0]
    specs = {s.name: s for s in task.aux_task_specs()}
    assert specs["source_unigram"].decoder_type == "ctc"
    assert specs["source_unigram"].input_from == "encoder"
    assert specs["source_unigram"].vocab_size == 10  # 4 specials + 6 letters
    assert specs["target_letter"].decoder_type == "transformer"
    assert specs["target_letter"].input_layer == 0  # encoder_layer: 1
    assert specs["target_letter"].decoder_dim == 16
    assert specs["decoder_ctc"].input_from == "decoder"
    assert specs["decoder_ctc"].input_layer == 1


def test_dataset_joins_text_targets(mt_built):
    task, model, crit, batch, variables = mt_built
    assert set(batch["multitask"]) == {
        "source_unigram", "target_letter", "decoder_ctc"}
    letter = batch["multitask"]["target_letter"]
    # transformer task: eos appended + prev_output_tokens present
    lens = letter["target_lengths"]
    for i, n in enumerate(lens):
        assert letter["target"][i, n - 1] == EOS
    assert letter["prev_output_tokens"][0, 0] == EOS
    # ctc task: no eos, no prev
    ctc = batch["multitask"]["source_unigram"]
    assert "prev_output_tokens" not in ctc
    n0 = ctc["target_lengths"][0]
    assert (ctc["target"][0, :n0] != EOS).all()
    # loss weights injected by prepare_batch at num_updates=0
    assert ctc["loss_weight"] == np.float32(8.0)
    assert letter["loss_weight"] == np.float32(1.0)


def test_model_emits_aux_logits(mt_built):
    task, model, crit, batch, variables = mt_built
    out = model.apply(
        variables, batch["src_tokens"], batch["src_lengths"],
        batch["prev_target"], tgt_tokens=batch["target"], deterministic=True,
        multitask_prev=task.multitask_prev(batch),
    )
    mt = out["multitask"]
    b = batch["target"].shape[0]
    enc_t = int(np.asarray(mt["source_unigram"]["mask"]).shape[1])
    assert mt["source_unigram"]["logits"].shape == (b, enc_t, 10)
    # decoder-tapped ctc runs over the CMLM canvas
    assert mt["decoder_ctc"]["logits"].shape[:2] == batch["prev_target"].shape
    np.testing.assert_array_equal(
        np.asarray(mt["decoder_ctc"]["mask"]), batch["prev_target"] != PAD)
    # transformer aux decoder predicts over its own prev tokens
    letter_prev = batch["multitask"]["target_letter"]["prev_output_tokens"]
    assert mt["target_letter"]["logits"].shape == (*letter_prev.shape, 10)


def test_criterion_adds_weighted_aux_losses(mt_built):
    task, model, crit, batch, variables = mt_built
    loss, mets, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                         train=True)
    assert np.isfinite(float(loss))
    for name in ("source_unigram", "target_letter", "decoder_ctc"):
        assert np.isfinite(float(mets[f"multitask_{name}_loss"]))

    # zeroing all aux weights recovers main-only loss; raising a weight
    # raises the total
    import copy

    zeroed = copy.deepcopy(batch)
    for name in zeroed["multitask"]:
        zeroed["multitask"][name]["loss_weight"] = np.float32(0.0)
    loss0, mets0, _ = crit(model, variables, zeroed, jax.random.PRNGKey(1),
                           train=False)
    lossw, _, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                       train=False)
    assert float(lossw) > float(loss0)
    main_only = mets0["nll_loss"]  # sanity: finite main pieces
    assert np.isfinite(float(main_only))


def test_loss_weight_decays_with_num_updates(mt_built, mt_data_dir):
    task = mt_built[0]
    task.set_num_updates(5)
    ds = task.dataset("train")
    batch = ds.collater([ds[0], ds[1]])
    batch = task.prepare_batch(batch, np.random.default_rng(0))
    # halfway through the 10-step decay from 1.0 to 0.1
    assert batch["multitask"]["target_letter"]["loss_weight"] == pytest.approx(
        1.0 - 5 * (0.9 / 10), abs=1e-6)
    task.set_num_updates(0)


# --------------------------------------------------------------------------
# AR model ("speech_to_unit" criterion) shares the same aux-head stack
# (reference builds identical aux decoders onto the AR S2UT model,
# s2s_transformer.py:171-230 + speech_to_speech_criterion.py:159-225)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mt_ar_built(mt_data_dir):
    cfg = _mt_cfg(
        mt_data_dir, arch="s2ut_conformer", criterion="speech_to_unit")
    task = TASKS.get("speech_to_speech_ar").setup_task(cfg)
    ds = task.dataset("train")
    batch = ds.collater([ds[i] for i in range(4)])
    batch = task.prepare_batch(batch, np.random.default_rng(0))
    model = task.build_model()
    crit = task.build_criterion()
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    return task, model, crit, batch, variables


def test_ar_model_emits_aux_logits(mt_ar_built):
    task, model, crit, batch, variables = mt_ar_built
    out = model.apply(
        variables, batch["src_tokens"], batch["src_lengths"],
        batch["prev_output_tokens"], tgt_tokens=batch["target"],
        deterministic=True, multitask_prev=task.multitask_prev(batch),
    )
    mt = out["multitask"]
    b = batch["target"].shape[0]
    enc_t = int(np.asarray(mt["source_unigram"]["mask"]).shape[1])
    assert mt["source_unigram"]["logits"].shape == (b, enc_t, 10)
    # decoder-tapped ctc runs over the teacher-forced decoder input
    assert (mt["decoder_ctc"]["logits"].shape[:2]
            == batch["prev_output_tokens"].shape)
    np.testing.assert_array_equal(
        np.asarray(mt["decoder_ctc"]["mask"]),
        batch["prev_output_tokens"] != PAD)
    letter_prev = batch["multitask"]["target_letter"]["prev_output_tokens"]
    assert mt["target_letter"]["logits"].shape == (*letter_prev.shape, 10)
    # without tgt_tokens (generation path) no aux heads run
    out_gen = model.apply(
        variables, batch["src_tokens"], batch["src_lengths"],
        batch["prev_output_tokens"], deterministic=True,
    )
    assert "multitask" not in out_gen


def test_ar_criterion_adds_weighted_aux_losses(mt_ar_built):
    task, model, crit, batch, variables = mt_ar_built
    loss, mets, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                         train=True)
    assert np.isfinite(float(loss))
    for name in ("source_unigram", "target_letter", "decoder_ctc"):
        assert np.isfinite(float(mets[f"multitask_{name}_loss"]))

    import copy

    zeroed = copy.deepcopy(batch)
    for name in zeroed["multitask"]:
        zeroed["multitask"][name]["loss_weight"] = np.float32(0.0)
    loss0, _, _ = crit(model, variables, zeroed, jax.random.PRNGKey(1),
                       train=False)
    lossw, _, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                       train=False)
    assert float(lossw) > float(loss0)


def test_ar_train_step_with_multitask(mt_data_dir):
    """One jitted trainer step through the AR aux-head grad path."""
    from diffnorm_tpu.config import make_trainer_config
    from diffnorm_tpu.train.trainer import Trainer

    cfg = _mt_cfg(mt_data_dir, arch="s2ut_conformer",
                  criterion="speech_to_unit", warmup_updates=10)
    task = TASKS.get("speech_to_speech_ar").setup_task(cfg)
    ds = task.dataset("train")
    batch = ds.collater([ds[i] for i in range(2)])
    batch = task.prepare_batch(batch, np.random.default_rng(0))
    trainer = Trainer(make_trainer_config(cfg), task, task.build_model(),
                      task.build_criterion())
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, mets = trainer.train_step(state, [batch], jax.random.PRNGKey(1))
    assert np.isfinite(mets["loss"])
    assert np.isfinite(mets["multitask_target_letter_loss"])


def test_train_step_with_multitask(mt_data_dir):
    """One jitted trainer step end-to-end with aux heads in the graph."""
    from diffnorm_tpu.config import make_trainer_config
    from diffnorm_tpu.train.trainer import Trainer

    cfg = _mt_cfg(mt_data_dir, warmup_updates=10)
    task = TASKS.get("speech_to_speech_fasttranslate").setup_task(cfg)
    ds = task.dataset("train")
    batch = ds.collater([ds[i] for i in range(2)])
    batch = task.prepare_batch(batch, np.random.default_rng(0))
    trainer = Trainer(make_trainer_config(cfg), task, task.build_model(),
                      task.build_criterion())
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, mets = trainer.train_step(state, [batch], jax.random.PRNGKey(1))
    assert np.isfinite(mets["loss"])
    assert np.isfinite(mets["multitask_target_letter_loss"])
