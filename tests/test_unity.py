"""UnitY two-pass direct S2ST (models/unity.py + generate/unity.py).

Reference surface: UnityConformerModel
(fairseq/models/speech_to_speech/s2s_conformer_unity.py), the
speech_to_unit_2pass criterion
(fairseq/criterions/speech_to_speech_criterion.py:258-330), and the
two-pass MultiDecoderSequenceGenerator
(examples/speech_to_speech/unity/sequence_generator_multi_decoder.py).
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


@pytest.fixture(scope="module")
def unity_data_dir(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("unitydata")
    rng = np.random.default_rng(0)
    for split, n in (("train", 4), ("test", 2)):
        rows = []
        for i in range(n):
            t = int(rng.integers(36, 56))
            feat = rng.normal(size=(t, 80)).astype(np.float32)
            np.save(tmp_path / f"{split}{i}.npy", feat)
            units = rng.integers(0, 10, size=t // 4 + 2)
            rows.append({
                "id": f"{split}{i}",
                "src_audio": str(tmp_path / f"{split}{i}.npy"),
                "src_n_frames": t, "tgt_audio": " ".join(map(str, units)),
                "tgt_n_frames": len(units),
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
        # aux encoder-tapped CTC head (kept to prove the remaining
        # multitask tasks still attach alongside the first-pass decoder)
        "source_unigram": {
            "decoder_type": "ctc",
            "dict": str(dict_path),
            "data": str(tmp_path / "source_unigram"),
            "loss_weight": 8.0,
        },
        # the first-pass MT decoder task (reference
        # s2s_conformer_unity.py:160-165 selects it via
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


def _unity_cfg(data_dir, **kw):
    cfg = Config(
        arch="unity_conformer", criterion="speech_to_unit_2pass",
        data=str(data_dir), multitask_config_yaml="multitask.yaml",
        target_is_code=True,
        encoder_layers=2, decoder_layers=2, encoder_embed_dim=32,
        encoder_ffn_embed_dim=64, encoder_attention_heads=2,
        decoder_attention_heads=2, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, conv_channels=32,
        depthwise_conv_kernel_size=7, target_code_size=10,
        translation_decoder_layers=2, synthesizer_encoder_layers=1,
        label_smoothing=0.2, lr=5e-4,
    )
    cfg.update(**kw)
    return cfg


@pytest.fixture(scope="module")
def unity_built(unity_data_dir):
    cfg = _unity_cfg(unity_data_dir)
    task = TASKS.get("speech_to_speech").setup_task(cfg)
    ds = task.dataset("train")
    batch = ds.collater([ds[i] for i in range(4)])
    batch = task.prepare_batch(batch, np.random.default_rng(0))
    model = task.build_model()
    crit = task.build_criterion()
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    return task, model, crit, batch, variables


def test_first_pass_task_selected_by_flag(unity_built):
    task = unity_built[0]
    # explicit is_first_pass_decoder flag wins (reference data_cfg.py:260-276)
    assert task.mt_task_name == "target_letter"
    # the model's aux specs EXCLUDE the first-pass task (its decoder is the
    # mt_decoder); only source_unigram attaches as an aux head
    model = unity_built[1]
    assert model.module.mt_task_name == "target_letter"
    assert [s.name for s in model.module.multitask] == ["source_unigram"]


def test_two_pass_forward_emits_both_losses(unity_built):
    task, model, crit, batch, variables = unity_built
    mt_prev = batch["multitask"]["target_letter"]["prev_output_tokens"]
    out = model.apply(
        variables, batch["src_tokens"], batch["src_lengths"],
        batch["prev_output_tokens"], prev_tokens_mt=mt_prev,
        tgt_tokens=batch["target"], deterministic=True,
        multitask_prev=task.multitask_prev(batch),
    )
    b, lt = batch["prev_output_tokens"].shape
    assert out["logits"].shape == (b, lt, 10 + 4)
    # first-pass decoder logits arrive through the multitask dict so the
    # standard aux accounting prices them (reference reuses mt_decoder_out
    # for that task's loss, speech_to_speech_criterion.py:300-320)
    mt_logits = out["multitask"]["target_letter"]["logits"]
    assert mt_logits.shape == (*mt_prev.shape, 6 + 4)
    enc_t = int(np.asarray(
        out["multitask"]["source_unigram"]["mask"]).shape[1])
    assert out["multitask"]["source_unigram"]["logits"].shape == (
        b, enc_t, 6 + 4)


def test_2pass_criterion_weights_first_pass_loss(unity_built):
    task, model, crit, batch, variables = unity_built
    loss, mets, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                         train=True)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(mets["multitask_target_letter_loss"]))
    assert np.isfinite(float(mets["multitask_source_unigram_loss"]))

    # zeroing the first-pass weight lowers the total but the forward (and
    # thus the unit loss) still runs through the mt features
    import copy

    zeroed = copy.deepcopy(batch)
    zeroed["multitask"]["target_letter"]["loss_weight"] = np.float32(0.0)
    zeroed["multitask"]["source_unigram"]["loss_weight"] = np.float32(0.0)
    loss0, mets0, _ = crit(model, variables, zeroed, jax.random.PRNGKey(1),
                           train=False)
    lossw, _, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                       train=False)
    assert float(lossw) > float(loss0)
    assert np.isfinite(float(mets0["nll_loss"]))


def test_synthesizer_encoder_optional(unity_data_dir):
    """synthesizer_encoder_layers=0 skips the t2u encoder (reference
    forward :242-253 falls back to identity)."""
    cfg = _unity_cfg(unity_data_dir, synthesizer_encoder_layers=0)
    task = TASKS.get("speech_to_speech").setup_task(cfg)
    model = task.build_model()
    assert model.module.synthesizer_encoder_layers == 0
    ds = task.dataset("train")
    batch = ds.collater([ds[0], ds[1]])
    batch = task.prepare_batch(batch, np.random.default_rng(0))
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    assert "synthesizer_encoder" not in variables["params"]
    crit = task.build_criterion()
    loss, _, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                      train=False)
    assert np.isfinite(float(loss))


def test_unity_generate_two_pass(unity_built):
    from diffnorm_tpu.generate.unity import unity_generate

    task, model, crit, batch, variables = unity_built
    seqs, scores, mt_best = unity_generate(
        model, variables, batch["src_tokens"], batch["src_lengths"],
        beam_size=2, beam_size_mt=2, max_len=16, max_len_mt=12)
    b = batch["src_tokens"].shape[0]
    assert np.asarray(seqs).shape == (b, 2, 16)
    assert np.asarray(scores).shape == (b, 2)
    assert np.asarray(mt_best).shape == (b, 12)
    seqs = np.asarray(seqs)
    mt_best = np.asarray(mt_best)
    # every finished hypothesis terminates with EOS then PADs; mt tokens
    # come from the text vocab (6 letters + specials)
    for i in range(b):
        assert (mt_best[i] < 10).all()
        row = seqs[i, 0]
        if (row == EOS).any():
            e = int(np.argmax(row == EOS))
            assert (row[e + 1:] == PAD).all()
    # beam ordering: best beam scores >= second beam
    scores = np.asarray(scores)
    assert (scores[:, 0] >= scores[:, 1] - 1e-5).all()


def test_unity_train_step(unity_data_dir):
    """One jitted trainer step through both decoder passes' grad path."""
    from diffnorm_tpu.config import make_trainer_config
    from diffnorm_tpu.train.trainer import Trainer

    cfg = _unity_cfg(unity_data_dir, warmup_updates=10)
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


def test_legacy_arch_name_registered():
    # reference registers the same model under s2ut_conformer_translatotron2
    assert ARCHITECTURES.get("unity_conformer")
    assert ARCHITECTURES.get("s2ut_conformer_translatotron2")


@pytest.mark.slow
def test_unity_train_generate_chain(unity_data_dir, tmp_path):
    """Full CLI chain: train the two-pass model -> two-pass beam decode
    from the saved checkpoint (reference tests this seam via
    fairseq_cli.train + generate with --task speech_to_speech)."""
    from diffnorm_tpu.cli import generate, train

    save_dir = str(tmp_path / "ckpt_unity")
    common = dict(
        task="speech_to_speech",
        **{k: v for k, v in _unity_cfg(unity_data_dir).items()},
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

    results = str(tmp_path / "unity_gen")
    rc = generate.main(Config(
        path=ckpt, results_path=results, cpu=True, batch_size=2,
        beam=2, beam_mt=2, max_target_positions=16, max_len_b_mt=12,
        **common,
    ))
    assert rc == 0
    txt = open(os.path.join(results, "generate-test.txt")).read()
    assert "H-" in txt and "T-" in txt
