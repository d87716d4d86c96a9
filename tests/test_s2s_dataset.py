"""SpeechToUnit dataset: TSV + config.yaml transforms, collation order,
conformer encoder shapes over its output."""

import os

import jax
import numpy as np
import pytest
import yaml

from diffnorm_tpu.data.dictionary import Dictionary
from diffnorm_tpu.data.manifest import write_translation_manifest
from diffnorm_tpu.data.s2s_dataset import SpeechToUnitDataset

PAD, EOS = 1, 2


@pytest.fixture
def data_dir(tmp_path):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        t = int(rng.integers(30, 50))
        feat = rng.normal(size=(t, 80)).astype(np.float32)
        np.save(tmp_path / f"utt{i}.npy", feat)
        units = rng.integers(0, 10, size=t // 4 + 2)
        rows.append({
            "id": f"utt{i}", "src_audio": str(tmp_path / f"utt{i}.npy"),
            "src_n_frames": t, "tgt_audio": " ".join(map(str, units)),
            "tgt_n_frames": len(units),
        })
    write_translation_manifest(str(tmp_path / "train.tsv"), rows)
    cfg = {
        "input_feat_per_channel": 80,
        "transforms": {"*": ["utterance_cmvn"], "_train": ["specaugment"]},
        "specaugment": {"freq_mask_N": 1, "freq_mask_F": 5,
                        "time_mask_N": 1, "time_mask_T": 5, "time_mask_p": 1.0},
    }
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(cfg))
    return tmp_path


def test_dataset_load_and_collate(data_dir):
    d = Dictionary.unit_dictionary(10)
    ds = SpeechToUnitDataset.from_tsv(
        root=str(data_dir), split="train", tgt_dict=d, is_train=True,
    )
    assert len(ds) == 4
    # transforms from the yaml applied (cmvn -> ~zero mean per utt)
    item = ds[0]
    assert abs(item["source"].mean()) < 0.2
    # targets have eos appended, +4 offset
    assert item["target"][-1] == EOS
    assert (item["target"][:-1] >= 4).all()

    batch = ds.collater([ds[i] for i in range(4)])
    # sorted by descending source frames
    assert (np.diff(batch["src_lengths"]) <= 0).all()
    assert batch["target"].shape[0] == 4
    # pad=1 on the target side
    lens = batch["target_lengths"]
    longest = int(lens.max())
    for i, n in enumerate(lens):
        assert (batch["target"][i, n:] == PAD).all() or n == longest


def test_conformer_shapes_over_batch(data_dir):
    import jax.numpy as jnp

    from diffnorm_tpu.models.conformer import ConformerEncoder, subsampled_lengths

    d = Dictionary.unit_dictionary(10)
    ds = SpeechToUnitDataset.from_tsv(
        root=str(data_dir), split="train", tgt_dict=d, is_train=False,
    )
    batch = ds.collater([ds[0], ds[1]])
    enc = ConformerEncoder(dim=16, ffn_dim=32, layers=1, heads=2,
                           conv_channels=16, depthwise_kernel_size=7)
    variables = enc.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["src_tokens"]),
        jnp.asarray(batch["src_lengths"]),
    )
    out, mask = enc.apply(
        variables, jnp.asarray(batch["src_tokens"]),
        jnp.asarray(batch["src_lengths"]),
    )
    exp_lens = np.asarray(subsampled_lengths(jnp.asarray(batch["src_lengths"])))
    assert out.shape[1] >= exp_lens.max()
    np.testing.assert_array_equal(np.asarray(mask).sum(1), exp_lens)
    # 4x temporal downsample
    assert abs(out.shape[1] - batch["src_tokens"].shape[1] / 4) <= 2

def test_concataugment_wiring(data_dir):
    """dataset_transforms: concataugment concatenates a partner's features
    and units (minus the first EOS), reference SpeechToTextDataset
    __getitem__ wiring."""
    d = Dictionary.unit_dictionary(10)
    cfg = yaml.safe_load((data_dir / "config.yaml").read_text())
    cfg["transforms"] = {}
    cfg["dataset_transforms"] = {"_train": ["concataugment"]}
    cfg["concataugment"] = {"rate": 1.0, "max_tokens": 3000, "attempts": 5}
    (data_dir / "config.yaml").write_text(yaml.safe_dump(cfg))

    ds = SpeechToUnitDataset.from_tsv(
        root=str(data_dir), split="train", tgt_dict=d, is_train=True)
    base = SpeechToUnitDataset.from_tsv(
        root=str(data_dir), split="train", tgt_dict=d, is_train=False)
    item = ds[0]
    single = base[0]
    # concatenated with some partner j != 0
    assert item["source"].shape[0] > single["source"].shape[0]
    assert len(item["target"]) > len(single["target"])
    # exactly one EOS, at the end (first sample's EOS stripped)
    assert item["target"][-1] == EOS
    assert (item["target"][:-1] != EOS).all()
    partner_frames = item["source"].shape[0] - single["source"].shape[0]
    assert partner_frames in [base[j]["source"].shape[0] for j in range(1, 4)]


def test_target_speaker_embed(data_dir):
    """--target-speaker-embed plumbing (reference
    speech_to_speech_dataset.py:90-96,219-229 + s2s_transformer.py:38-52):
    per-utt speaker embeddings joined by id, collated [B, D], consumed by the
    NAR/AR S2UT modules via a concat + projection on the encoder output."""
    import jax.numpy as jnp

    from diffnorm_tpu.models.nar_transformer import NARS2UTModule

    rng = np.random.default_rng(1)
    spk_dir = data_dir / "spk"
    spk_dir.mkdir()
    lines = ["id\tspeaker_embed"]
    for i in range(4):
        emb = rng.normal(size=(16,)).astype(np.float32)
        np.save(spk_dir / f"utt{i}.spk.npy", emb)
        lines.append(f"utt{i}\t{spk_dir}/utt{i}.spk.npy")
    (spk_dir / "train.tsv").write_text("\n".join(lines) + "\n")
    cfg = yaml.safe_load((data_dir / "config.yaml").read_text())
    cfg["target_speaker_embed"] = str(spk_dir)
    (data_dir / "config.yaml").write_text(yaml.safe_dump(cfg))

    d = Dictionary.unit_dictionary(10)
    ds = SpeechToUnitDataset.from_tsv(
        root=str(data_dir), split="train", tgt_dict=d, is_train=False,
    )
    assert ds.tgt_speakers is not None
    item = ds[2]
    np.testing.assert_array_equal(
        item["tgt_speaker"], np.load(spk_dir / "utt2.spk.npy"))
    batch = ds.collater([ds[i] for i in range(4)])
    assert batch["tgt_speaker"].shape == (4, 16)
    # join is by id, surviving the desc-length collation sort
    order = batch["id"]
    for row, idx in enumerate(order):
        np.testing.assert_array_equal(
            batch["tgt_speaker"][row],
            np.load(spk_dir / f"utt{idx}.spk.npy"))

    module = NARS2UTModule(
        vocab_size=14, encoder_dim=32, encoder_ffn_dim=64, encoder_layers=1,
        encoder_heads=2, decoder_dim=32, decoder_ffn_dim=64, decoder_layers=1,
        decoder_heads=2, depthwise_kernel_size=7, conv_channels=32,
        target_speaker_embed=True, speaker_embed_dim=16,
    )
    src = jnp.asarray(batch["src_tokens"])
    src_lengths = jnp.asarray(batch["src_lengths"])
    prev = jnp.full((4, 6), 3, jnp.int32)
    tgt = jnp.full((4, 6), 5, jnp.int32)
    spk = jnp.asarray(batch["tgt_speaker"])
    variables = module.init(jax.random.PRNGKey(0), src, src_lengths, prev,
                            tgt_tokens=tgt, tgt_speaker=spk)
    assert "spk_emb_proj" in variables["params"]
    out = module.apply(variables, src, src_lengths, prev, tgt_tokens=tgt,
                       tgt_speaker=spk, deterministic=True)
    out_no = module.apply(variables, src, src_lengths, prev, tgt_tokens=tgt,
                          deterministic=True)
    # the speaker embedding changes the logits; omitting it is a no-op path
    assert not np.allclose(np.asarray(out["logits"]),
                           np.asarray(out_no["logits"]))
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_target_speaker_embed_decode(data_dir):
    """tgt_speaker reaches the jitted mask-predict decode (and conditioning
    actually changes the decoded units vs the unconditioned path)."""
    import jax.numpy as jnp

    from diffnorm_tpu.generate.mask_predict import mask_predict_decode
    from diffnorm_tpu.models.nar_transformer import NARS2UTModule
    from diffnorm_tpu.models.vae import ModelHolder
    from diffnorm_tpu.config import Config

    module = NARS2UTModule(
        vocab_size=14, encoder_dim=32, encoder_ffn_dim=64, encoder_layers=1,
        encoder_heads=2, decoder_dim=32, decoder_ffn_dim=64, decoder_layers=1,
        decoder_heads=2, depthwise_kernel_size=7, conv_channels=32,
        target_speaker_embed=True, speaker_embed_dim=16,
    )
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.normal(size=(2, 40, 80)), jnp.float32)
    src_lengths = jnp.asarray([40, 28], jnp.int32)
    spk = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
    prev = jnp.full((2, 6), 3, jnp.int32)
    variables = module.init(jax.random.PRNGKey(0), src, src_lengths, prev,
                            tgt_tokens=prev, tgt_speaker=spk)
    model = ModelHolder(module=module, cfg=Config())
    toks, _, _ = mask_predict_decode(
        model, variables, src, src_lengths, max_iter=2, max_len=16,
        tgt_speaker=spk)
    toks_no, _, _ = mask_predict_decode(
        model, variables, src, src_lengths, max_iter=2, max_len=16)
    assert np.asarray(toks).shape == np.asarray(toks_no).shape
    assert np.isfinite(np.asarray(toks)).all()
