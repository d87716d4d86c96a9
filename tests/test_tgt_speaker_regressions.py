"""--target-speaker-embed end-to-end regressions (round-2 advisor findings).

Covers: init_variables tracing spk_emb_proj when the batch carries
tgt_speaker (NAR + AR tasks), UnitY accepting/conditioning on tgt_speaker
(reference s2s_conformer_unity.py:219-227), stacked-AR and unity decode
threading the embedding, and the use_audio_input + target_speaker_embed
dataset combination.
"""

import jax
import numpy as np
import pytest
import yaml

from diffnorm_tpu.config import Config
from diffnorm_tpu.data.dictionary import Dictionary
from diffnorm_tpu.data.manifest import write_translation_manifest
from diffnorm_tpu.data.s2s_dataset import SpeechToUnitDataset
from diffnorm_tpu.registry import TASKS

PAD, BOS, EOS, UNK = 1, 0, 2, 3
SPK_DIM = 16


def _write_s2s_data(tmp_path, rng, n=4, with_speaker=True):
    rows = []
    for i in range(n):
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
    cfg = {"input_feat_per_channel": 80}
    if with_speaker:
        spk_dir = tmp_path / "spk"
        spk_dir.mkdir()
        lines = ["id\tspeaker_embed"]
        for i in range(n):
            emb = rng.normal(size=(SPK_DIM,)).astype(np.float32)
            np.save(spk_dir / f"utt{i}.spk.npy", emb)
            lines.append(f"utt{i}\t{spk_dir}/utt{i}.spk.npy")
        (spk_dir / "train.tsv").write_text("\n".join(lines) + "\n")
        cfg["target_speaker_embed"] = str(spk_dir)
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(cfg))
    return tmp_path


def _small_cfg(data_dir, **kw):
    cfg = Config(
        data=str(data_dir), encoder_layers=1, decoder_layers=1,
        encoder_embed_dim=32, encoder_ffn_embed_dim=64,
        encoder_attention_heads=2, decoder_attention_heads=2,
        decoder_embed_dim=32, decoder_ffn_embed_dim=64, conv_channels=32,
        depthwise_conv_kernel_size=7, target_code_size=10,
        target_speaker_embed=True, speaker_embed_dim=SPK_DIM, lr=5e-4,
    )
    cfg.update(**kw)
    return cfg


def _built(task_name, cfg):
    task = TASKS.get(task_name).setup_task(cfg)
    ds = task.dataset("train")
    batch = ds.collater([ds[i] for i in range(4)])
    batch = task.prepare_batch(batch, np.random.default_rng(0))
    model = task.build_model()
    crit = task.build_criterion()
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    return task, model, crit, batch, variables


def test_nar_init_and_train_step_with_speaker(tmp_path):
    """The advisor's high repro: init without tgt_speaker left spk_emb_proj
    untraced, so the first criterion call (which does pass tgt_speaker)
    raised ScopeParamNotFoundError."""
    _write_s2s_data(tmp_path, np.random.default_rng(0))
    cfg = _small_cfg(tmp_path, arch="nar_s2ut_conformer",
                     criterion="nar_speech_to_unit", label_smoothing=0.2)
    task, model, crit, batch, variables = _built(
        "speech_to_speech_fasttranslate", cfg)
    assert batch.get("tgt_speaker") is not None
    assert "spk_emb_proj" in variables["params"]
    loss, metrics, _ = crit(model, variables, batch,
                            jax.random.PRNGKey(1), train=True)
    assert np.isfinite(float(loss))


def test_ar_init_and_train_step_with_speaker(tmp_path):
    _write_s2s_data(tmp_path, np.random.default_rng(1))
    cfg = _small_cfg(tmp_path, arch="s2ut_conformer",
                     criterion="label_smoothed_cross_entropy",
                     label_smoothing=0.2)
    task, model, crit, batch, variables = _built("speech_to_speech_ar", cfg)
    assert batch.get("tgt_speaker") is not None
    assert "spk_emb_proj" in variables["params"]
    loss, metrics, _ = crit(model, variables, batch,
                            jax.random.PRNGKey(1), train=True)
    assert np.isfinite(float(loss))


@pytest.fixture(scope="module")
def unity_spk_dir(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("unityspk")
    rng = np.random.default_rng(2)
    _write_s2s_data(tmp_path, rng)
    letters = [chr(ord("a") + k) for k in range(6)]
    dict_path = tmp_path / "dict.letters.txt"
    dict_path.write_text("".join(f"{w} 1\n" for w in letters))
    d = tmp_path / "target_letter"
    d.mkdir()
    with open(d / "train.tsv", "w") as f:
        f.write("id\ttgt_text\n")
        for i in range(4):
            txt = " ".join(rng.choice(letters, size=int(rng.integers(3, 7))))
            f.write(f"utt{i}\t{txt}\n")
    (tmp_path / "multitask.yaml").write_text(yaml.safe_dump({
        "target_letter": {
            "decoder_type": "transformer",
            "dict": str(dict_path),
            "data": str(d),
            "is_first_pass_decoder": True,
            "loss_weight": 1.0,
            "decoder_args": {"dropout": 0.1},
        },
    }))
    return tmp_path


def test_unity_train_step_with_speaker(unity_spk_dir):
    """Advisor medium: ce_loss injects tgt_speaker whenever the batch has it;
    UnityS2UTModule must accept (and condition on) it like the reference."""
    cfg = _small_cfg(
        unity_spk_dir, arch="unity_conformer",
        criterion="speech_to_unit_2pass", target_is_code=True,
        multitask_config_yaml="multitask.yaml",
        translation_decoder_layers=1, synthesizer_encoder_layers=1,
        label_smoothing=0.2)
    task, model, crit, batch, variables = _built("speech_to_speech", cfg)
    assert batch.get("tgt_speaker") is not None
    assert "spk_emb_proj" in variables["params"]
    loss, metrics, _ = crit(model, variables, batch,
                            jax.random.PRNGKey(1), train=True)
    assert np.isfinite(float(loss))

    # conditioning is live: different speakers -> different unit logits
    mt_prev = batch["multitask"]["target_letter"]["prev_output_tokens"]
    kw = dict(prev_tokens_mt=mt_prev, tgt_tokens=batch["target"],
              deterministic=True, multitask_prev=task.multitask_prev(batch))
    out_a = model.apply(variables, batch["src_tokens"], batch["src_lengths"],
                        batch["prev_output_tokens"],
                        tgt_speaker=batch["tgt_speaker"], **kw)
    out_b = model.apply(variables, batch["src_tokens"], batch["src_lengths"],
                        batch["prev_output_tokens"], **kw)
    assert not np.allclose(np.asarray(out_a["logits"]),
                           np.asarray(out_b["logits"]))


def test_unity_generate_threads_speaker(unity_spk_dir):
    import jax.numpy as jnp

    from diffnorm_tpu.generate.unity import unity_generate

    cfg = _small_cfg(
        unity_spk_dir, arch="unity_conformer",
        criterion="speech_to_unit_2pass", target_is_code=True,
        multitask_config_yaml="multitask.yaml",
        translation_decoder_layers=1, synthesizer_encoder_layers=1,
        label_smoothing=0.2)
    task, model, crit, batch, variables = _built("speech_to_speech", cfg)
    src = jnp.asarray(batch["src_tokens"])[:2]
    lengths = jnp.asarray(batch["src_lengths"])[:2]
    spk = jnp.asarray(batch["tgt_speaker"])[:2]
    seqs, scores, mt = unity_generate(
        model, variables, src, lengths, beam_size=2, beam_size_mt=2,
        max_len=16, max_len_mt=16, tgt_speaker=spk)
    assert np.asarray(seqs).shape[0] == 2
    assert np.isfinite(np.asarray(scores)).all()


def test_ar_stacked_decode_threads_speaker(tmp_path):
    """Advisor medium: stacked decode dropped the speaker embedding the model
    was trained with (reference StackUnitSequenceGenerator passes speaker to
    forward_encoder, tasks/speech_to_speech.py:71-73)."""
    import jax.numpy as jnp

    from diffnorm_tpu.generate.beam_search import ar_generate_stacked

    _write_s2s_data(tmp_path, np.random.default_rng(3))
    cfg = _small_cfg(tmp_path, arch="s2ut_conformer",
                     criterion="label_smoothed_cross_entropy",
                     n_frames_per_step=2, label_smoothing=0.2)
    task, model, crit, batch, variables = _built("speech_to_speech_ar", cfg)
    src = jnp.asarray(batch["src_tokens"])[:2]
    lengths = jnp.asarray(batch["src_lengths"])[:2]
    spk = jnp.asarray(batch["tgt_speaker"])[:2]
    packed, sub = ar_generate_stacked(
        model, variables, src, lengths, max_len=8, tgt_speaker=spk)
    packed_no, sub_no = ar_generate_stacked(
        model, variables, src, lengths, max_len=8)
    assert np.asarray(packed).shape == np.asarray(packed_no).shape
    # speaker conditioning reaches the decode (random init: streams differ)
    assert not np.array_equal(np.asarray(sub), np.asarray(sub_no))


def test_audio_input_with_speaker_collates(tmp_path):
    """Advisor low: the use_audio_input early return omitted tgt_speaker,
    KeyError-ing the collater when both options are configured."""
    rng = np.random.default_rng(4)
    _write_s2s_data(tmp_path, rng)
    cfg = yaml.safe_load((tmp_path / "config.yaml").read_text())
    cfg["use_audio_input"] = True
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(cfg))
    # raw waveforms instead of fbank features
    for i in range(4):
        wav = rng.normal(size=(1600,)).astype(np.float32)
        np.save(tmp_path / f"utt{i}.npy", wav)
    d = Dictionary.unit_dictionary(10)
    ds = SpeechToUnitDataset.from_tsv(
        root=str(tmp_path), split="train", tgt_dict=d, is_train=False)
    item = ds[0]
    assert "tgt_speaker" in item
    batch = ds.collater([ds[i] for i in range(4)])
    assert batch["tgt_speaker"].shape == (4, SPK_DIM)


@pytest.mark.slow
def test_cli_train_generate_chain_with_speaker(tmp_path):
    """Full CLI chain with --target-speaker-embed on (the round-2 advisor's
    requested end-to-end repro): fairseq-train on a speaker-embedding
    dataset -> checkpoint -> fairseq-generate with per-utterance speaker
    conditioning injected into the jitted decode."""
    import os

    from diffnorm_tpu.cli import generate, train

    rng = np.random.default_rng(7)
    _write_s2s_data(tmp_path, rng)
    # dev + test splits reuse the train rows (tiny smoke)
    import shutil

    for split in ("dev", "test"):
        shutil.copy(tmp_path / "train.tsv", tmp_path / f"{split}.tsv")
        shutil.copy(tmp_path / "spk" / "train.tsv",
                    tmp_path / "spk" / f"{split}.tsv")

    base = dict(
        task="speech_to_speech_fasttranslate",
        arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
        data=str(tmp_path), encoder_layers=1, decoder_layers=1,
        encoder_embed_dim=32, encoder_ffn_embed_dim=64,
        encoder_attention_heads=2, decoder_attention_heads=2,
        decoder_embed_dim=32, decoder_ffn_embed_dim=64, conv_channels=32,
        depthwise_conv_kernel_size=7, target_code_size=10,
        target_speaker_embed=True, speaker_embed_dim=SPK_DIM,
        label_smoothing=0.2,
    )
    save_dir = str(tmp_path / "ckpt")
    rc = train.main(Config(
        save_dir=save_dir, cpu=True, batch_size=2, lr=1e-3,
        warmup_updates=2, log_interval=1, max_updates=2,
        keep_last_epochs=1, keep_best_checkpoints=1, seed=3,
        valid_subset="dev", **base))
    assert rc == 0
    ckpts = sorted(d for d in os.listdir(save_dir)
                   if d.startswith("step_") and not d.endswith(".json")
                   and "tmp" not in d)
    assert ckpts
    ckpt = os.path.join(save_dir, ckpts[-1])

    results = str(tmp_path / "gen")
    rc = generate.main(Config(
        path=ckpt, results_path=results, cpu=True, batch_size=2,
        gen_subset="test", max_target_positions=16,
        iter_decode_max_iter=2, **base))
    assert rc == 0
    txt = open(os.path.join(results, "generate-test.txt")).read()
    assert "H-" in txt and "T-" in txt
