"""Speech-to-text family (models/s2t_transformer.py, tasks/s2t_task.py):
forward shapes for both encoder types, arch registry stamps, dataset
round trip. The full train->generate chain is slow-marked in
test_cli_chains.py."""

import numpy as np

from diffnorm_tpu.config import Config
from diffnorm_tpu.registry import ARCHITECTURES, build_model


def _forward(arch, **over):
    import jax

    cfg = Config(arch=arch, vocab_size=20, encoder_embed_dim=16,
                 encoder_ffn_embed_dim=32, encoder_layers=2,
                 decoder_embed_dim=16, decoder_ffn_embed_dim=32,
                 decoder_layers=2, encoder_attention_heads=2,
                 decoder_attention_heads=2, conv_channels=16, **over)
    model = build_model(arch, cfg)
    rng = np.random.default_rng(0)
    src = rng.normal(size=(2, 24, 8)).astype(np.float32)
    lengths = np.asarray([24, 17], np.int32)
    prev = rng.integers(0, 20, size=(2, 6)).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), src, lengths, prev,
                           deterministic=True)
    out = model.apply(variables, src, lengths, prev, deterministic=True)
    return out["logits"]


def test_s2t_transformer_forward_shape():
    logits = _forward("s2t_transformer_xs")
    assert logits.shape == (2, 6, 20)


def test_s2t_conformer_forward_shape():
    logits = _forward("s2t_conformer")
    assert logits.shape == (2, 6, 20)


def test_s2t_archs_registered():
    for arch in ("s2t_transformer", "s2t_transformer_s",
                 "s2t_transformer_xs", "s2t_conformer"):
        assert arch in ARCHITECTURES, arch
    # reference default stamps (s2t_transformer.py:459-514)
    cfg = Config(arch="s2t_transformer")
    ARCHITECTURES.get("s2t_transformer")[1](cfg)
    assert cfg.get("encoder_layers") == 12 and cfg.get("decoder_layers") == 6
    cfg_s = Config(arch="s2t_transformer_s")
    ARCHITECTURES.get("s2t_transformer_s")[1](cfg_s)
    assert cfg_s.get("encoder_embed_dim") == 256
    assert cfg_s.get("encoder_ffn_embed_dim") == 2048


def test_s2t_dataset_round_trip(tmp_path):
    from diffnorm_tpu.data.dictionary import Dictionary
    from diffnorm_tpu.data.s2t_dataset import (
        SpeechToTextDataset,
        write_s2t_manifest,
    )

    rng = np.random.default_rng(0)
    (tmp_path / "dict.txt").write_text("a 3\nb 2\nc 1\n")
    rows = []
    for i in range(3):
        np.save(tmp_path / f"u{i}.npy",
                rng.normal(size=(10 + i, 4)).astype(np.float32))
        rows.append(dict(id=f"u{i}", audio=f"u{i}.npy", n_frames=10 + i,
                         tgt_text="a b c"))
    write_s2t_manifest(str(tmp_path / "train.tsv"), rows)
    d = Dictionary.load(str(tmp_path / "dict.txt"))
    ds = SpeechToTextDataset.from_tsv(str(tmp_path), "train", d,
                                      is_train=False)
    assert len(ds) == 3
    batch = ds.collater([ds[i] for i in range(3)])
    assert batch["src_tokens"].shape[0] == 3
    assert batch["src_tokens"].shape[2] == 4
    # "a b c" + eos = ids [4, 5, 6, 2]
    row = batch["target"][np.argmax(batch["id"] == 0)]
    assert list(row[:4]) == [4, 5, 6, 2]


def test_hubert_ctc_forward_and_loss():
    """hubert_ctc frame logits + ctc criterion finite loss on a synthetic
    batch (reference hubert_asr.py + criterions/ctc.py)."""
    import jax

    from diffnorm_tpu.registry import CRITERIONS

    cfg = Config(arch="hubert_ctc", vocab_size=12, encoder_embed_dim=32,
                 encoder_ffn_embed_dim=64, encoder_layers=2,
                 encoder_attention_heads=2)
    model = build_model("hubert_ctc", cfg)
    rng = np.random.default_rng(0)
    batch = {
        "src_tokens": rng.normal(size=(2, 2000, 1)).astype(np.float32),
        "src_lengths": np.asarray([2000, 1500], np.int32),
        "target": np.asarray([[4, 5, 6], [7, 8, 1]], np.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["src_tokens"],
                           batch["src_lengths"], deterministic=True)
    out = model.apply(variables, batch["src_tokens"], batch["src_lengths"],
                      deterministic=True)
    from diffnorm_tpu.models.hubert import frames_for_samples

    assert out["logits"].shape == (2, frames_for_samples(2000), 12)
    assert int(out["logit_lengths"][1]) == frames_for_samples(1500)

    crit = CRITERIONS.get("ctc")(cfg)
    loss, metrics, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                            train=False)
    assert np.isfinite(float(loss))
    assert metrics["sample_size"] == 5  # pad-1 excluded


def test_hubert_ctc_finetune_masking():
    """--apply-mask fine-tune regularization (reference hubert_asr.py:310 +
    wav2vec2 apply_mask :414-485): the task draws time+channel masks, the
    model applies them ONLY at train time (eval forward is unchanged vs an
    unmasked model), and a trainer step moves mask_emb."""
    import jax
    import jax.numpy as jnp

    from diffnorm_tpu.config import Config, make_trainer_config
    from diffnorm_tpu.registry import TASKS
    from diffnorm_tpu.train.trainer import Trainer

    cfg = Config(
        arch="hubert_ctc", criterion="ctc", task="dummy_ctc",
        conv_feature_layers="[(16,10,5),(16,3,2)]", vocab_size=12,
        encoder_embed_dim=32, encoder_layers=1, encoder_attention_heads=2,
        encoder_ffn_embed_dim=64, apply_mask=True, mask_prob=0.5,
        mask_length=4, mask_channel_prob=0.25, mask_channel_length=8,
        lr=1e-3, tokens_per_sample=1000, batch_size=2,
    )
    task = TASKS.get("dummy_ctc").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    rng = np.random.default_rng(0)
    batch = task.prepare_batch(task.dummy_batch(2, 1000), rng)
    assert batch["mask_indices"].any() and batch["channel_mask"].any()
    assert batch["channel_mask"].shape == (2, 32)

    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    assert "mask_emb" in variables["params"]

    # eval forward ignores the masks entirely
    out_eval = model.apply(
        variables, batch["src_tokens"], batch["src_lengths"],
        deterministic=True, mask_indices=jnp.asarray(batch["mask_indices"]),
        channel_mask=jnp.asarray(batch["channel_mask"]),
    )
    out_plain = model.apply(
        variables, batch["src_tokens"], batch["src_lengths"],
        deterministic=True,
    )
    np.testing.assert_array_equal(
        np.asarray(out_eval["logits"]), np.asarray(out_plain["logits"]))

    # train forward applies them (all dropouts are 0 -> the difference IS
    # the masking)
    out_train = model.apply(
        variables, batch["src_tokens"], batch["src_lengths"],
        deterministic=False, mask_indices=jnp.asarray(batch["mask_indices"]),
        channel_mask=jnp.asarray(batch["channel_mask"]),
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert np.abs(np.asarray(out_train["logits"])
                  - np.asarray(out_plain["logits"])).max() > 1e-4

    trainer = Trainer(make_trainer_config(cfg), task, model, crit)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    p0 = jax.device_get(state.params)
    state, mets = trainer.train_step(state, [batch], jax.random.PRNGKey(1))
    assert np.isfinite(float(mets["loss"]))
    p1 = jax.device_get(state.params)
    emb0 = p0.get("params", p0)["mask_emb"]
    emb1 = p1.get("params", p1)["mask_emb"]
    assert np.abs(emb1 - emb0).max() > 0


def test_freeze_finetune_updates():
    """--freeze-finetune-updates N (hubert_asr.py:310-316): the w2v
    backbone stays EXACTLY unchanged (weight decay included) for the first
    N optimizer steps, then trains; the proj head trains throughout."""
    import jax

    from diffnorm_tpu.config import Config, make_trainer_config
    from diffnorm_tpu.registry import TASKS
    from diffnorm_tpu.train.trainer import Trainer

    cfg = Config(
        arch="hubert_ctc", criterion="ctc", task="dummy_ctc",
        conv_feature_layers="[(16,10,5),(16,3,2)]", vocab_size=12,
        encoder_embed_dim=32, encoder_layers=1, encoder_attention_heads=2,
        encoder_ffn_embed_dim=64, lr=1e-3, weight_decay=0.01,
        freeze_finetune_updates=2, tokens_per_sample=1000, batch_size=2,
    )
    task = TASKS.get("dummy_ctc").setup_task(cfg)
    trainer = Trainer(make_trainer_config(cfg), task, task.build_model(),
                      task.build_criterion())
    batch = task.dummy_batch(2, 1000)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    def enc(s):
        p = jax.device_get(s.params)
        return p.get("params", p)["w2v_model"], p.get("params", p)["proj"]

    e0, h0 = enc(state)
    for i in range(2):  # frozen window
        state, mets = trainer.train_step(state, [batch],
                                         jax.random.PRNGKey(10 + i))
    e2, h2 = enc(state)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), e0, e2)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0  # bit-frozen
    assert float(np.abs(h2["kernel"] - h0["kernel"]).max()) > 0  # head moves

    state, mets = trainer.train_step(state, [batch], jax.random.PRNGKey(99))
    e3, _ = enc(state)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), e2, e3)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0  # unfrozen at step 3
