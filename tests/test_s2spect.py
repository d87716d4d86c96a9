"""Speech-to-spectrogram S2ST family (models/s2spect.py,
tasks/s2spect_task.py): forward shapes, criterion contract, AR rollout
through the speech encoder, dataset collater."""

import jax
import numpy as np

from diffnorm_tpu.config import Config
from diffnorm_tpu.registry import ARCHITECTURES, CRITERIONS, build_model

TINY = dict(encoder_embed_dim=16, encoder_ffn_embed_dim=32,
            encoder_layers=2, encoder_attention_heads=2,
            decoder_embed_dim=16, decoder_ffn_embed_dim=32,
            decoder_transformer_layers=2, decoder_attention_heads=2,
            conv_channels=16, prenet_dim=8, postnet_conv_dim=8,
            postnet_layers=2, output_frame_dim=6)


def _model(arch="s2spect_transformer", **over):
    cfg = Config(arch=arch, **{**TINY, **over})
    return build_model(arch, cfg), cfg


def _batch(out_dim=6, feat_dim=5, b=2, s=24, t=8):
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(b, t, out_dim)).astype(np.float32)
    prev = np.zeros_like(feat)
    prev[:, 1:] = feat[:, :-1]
    t_lens = np.asarray([t, t - 3], np.int32)
    return {
        "src_tokens": rng.normal(size=(b, s, feat_dim)).astype(np.float32),
        "src_lengths": np.asarray([s, s - 7], np.int32),
        "feat_tgt": feat, "tgt_lengths": t_lens, "prev_feats": prev,
        "tgt_mask": np.arange(t)[None, :] < t_lens[:, None],
        "ntokens": int(t_lens.sum()), "nsentences": b,
    }


def test_s2spect_forward_and_loss():
    model, cfg = _model()
    batch = _batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["src_tokens"], batch["src_lengths"],
        batch["prev_feats"], batch["tgt_mask"], deterministic=True)
    out = model.apply(variables, batch["src_tokens"], batch["src_lengths"],
                      batch["prev_feats"], batch["tgt_mask"],
                      deterministic=True,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert out["post_feat"].shape == batch["feat_tgt"].shape
    assert out["eos_logits"].shape == batch["tgt_mask"].shape

    crit = CRITERIONS.get("speech_to_spectrogram")(cfg)
    loss, metrics, _ = crit(model, variables, batch, jax.random.PRNGKey(3),
                            train=False)
    assert np.isfinite(float(loss))


def test_s2spect_conformer_variant():
    model, _ = _model("s2spect_conformer", encoder_layers=1)
    batch = _batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["src_tokens"], batch["src_lengths"],
        batch["prev_feats"], batch["tgt_mask"], deterministic=True)
    out = model.apply(variables, batch["src_tokens"], batch["src_lengths"],
                      batch["prev_feats"], batch["tgt_mask"],
                      deterministic=True,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert out["post_feat"].shape == batch["feat_tgt"].shape


def test_s2spect_ar_rollout():
    """The jitted AR spectrogram rollout drives the speech encoder via the
    src_lengths-threaded encode (generate/speech_ar.py)."""
    from diffnorm_tpu.generate.speech_ar import ar_speech_generate

    model, _ = _model()
    batch = _batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["src_tokens"], batch["src_lengths"],
        batch["prev_feats"], batch["tgt_mask"], deterministic=True)
    feats, out_lens, eos_prob = ar_speech_generate(
        model, variables, batch["src_tokens"], max_iter=10,
        src_lengths=batch["src_lengths"])
    assert feats.shape == (2, 10, 6)
    assert (np.asarray(out_lens) >= 1).all()


def test_s2spect_archs_registered():
    for arch in ("s2spect_transformer", "s2spect_transformer_fisher",
                 "s2spect_conformer"):
        assert arch in ARCHITECTURES, arch
    cfg = Config(arch="s2spect_transformer_fisher")
    ARCHITECTURES.get("s2spect_transformer_fisher")[1](cfg)
    # reference s2spect_architecture_fisher (s2s_transformer.py:748-758)
    assert cfg.get("encoder_embed_dim") == 256
    assert cfg.get("prenet_dim") == 32
    assert cfg.get("decoder_transformer_layers") == 6


def test_s2spect_dataset_collater(tmp_path):
    from diffnorm_tpu.data.manifest import write_translation_manifest
    from diffnorm_tpu.tasks.s2spect_task import SpeechToSpectrogramDataset

    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):
        np.save(tmp_path / f"s{i}.npy",
                rng.normal(size=(12 + i, 4)).astype(np.float32))
        np.save(tmp_path / f"t{i}.npy",
                rng.normal(size=(9 + i, 6)).astype(np.float32))
        rows.append(dict(id=f"u{i}", src_audio=f"s{i}.npy",
                         src_n_frames=12 + i, tgt_audio=f"t{i}.npy",
                         tgt_n_frames=9 + i))
    write_translation_manifest(str(tmp_path / "train.tsv"), rows)
    ds = SpeechToSpectrogramDataset.from_tsv(str(tmp_path), "train",
                                             is_train=False)
    batch = ds.collater([ds[i] for i in range(3)])
    assert batch["src_tokens"].shape == (3, 14, 4)
    assert batch["feat_tgt"].shape == (3, 11, 6)
    # prev is the zero-fronted shift of the target
    np.testing.assert_array_equal(batch["prev_feats"][:, 0], 0.0)
    np.testing.assert_array_equal(batch["prev_feats"][:, 1:],
                                  batch["feat_tgt"][:, :-1])
