"""wav2vec 2.0 pretraining parity against the REAL reference model.

The reference Wav2Vec2Model (wav2vec2.py, exec'd verbatim) runs its full
contrastive forward — conv extractor, span-mask substitution, transformer
encoder, gumbel quantizer (eval: hard argmax), project_q/final_proj,
cosine logits over [positive; 100 negatives] with duplicate-of-positive
-inf masking — and our static-shaped Wav2Vec2PretrainModule must reproduce
the logits, perplexities, features_pen and criterion loss after checkpoint
conversion. Mask indices are injected (the ref forward accepts them);
negatives are injected by patching sample_negatives with the indices our
task drew, so the comparison pins the MATH with shared randomness.
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import torch

from reference_loader import load_wav2vec2

from diffnorm_tpu.config import Config, make_trainer_config
from diffnorm_tpu.registry import TASKS
from diffnorm_tpu.utils.masking import compute_mask_indices

B, T_WAV = 2, 2010  # -> 100 conv frames (even: no seq-multiple pad)
CONV_SPEC = ((64, 10, 5), (64, 3, 2), (64, 2, 2))
N_NEG = 10


def _build_ref_model():
    w2v = load_wav2vec2()
    cfg = w2v.Wav2Vec2Config()
    cfg.conv_feature_layers = str(list(CONV_SPEC))
    cfg.encoder_embed_dim = 96
    cfg.encoder_layers = 2
    cfg.encoder_attention_heads = 4
    cfg.encoder_ffn_embed_dim = 192
    cfg.final_dim = 32
    cfg.quantize_targets = True
    cfg.latent_vars = 24
    cfg.latent_groups = 2
    cfg.latent_temp = (2.0, 0.5, 0.999995)
    cfg.num_negatives = N_NEG
    cfg.dropout = 0.0
    cfg.attention_dropout = 0.0
    cfg.activation_dropout = 0.0
    cfg.dropout_input = 0.0
    cfg.dropout_features = 0.0
    cfg.encoder_layerdrop = 0.0
    cfg.feature_grad_mult = 1.0
    torch.manual_seed(0)
    model = w2v.Wav2Vec2Model(cfg)
    model.eval()
    return model


def test_wav2vec2_forward_matches_reference():
    from diffnorm_tpu.models.wav2vec2 import Wav2Vec2PretrainModule
    from diffnorm_tpu.utils.convert_weights import (
        convert_wav2vec2_pretrain_state,
    )

    model = _build_ref_model()
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(B, T_WAV)) * 0.1).astype(np.float32)
    n_frames = 100

    # shared mask (equal count per row -> the ref's masked view works)
    np.random.seed(5)
    mask = compute_mask_indices(
        (B, n_frames), np.zeros((B, n_frames), bool),
        mask_prob=0.5, mask_length=4, min_masks=2, rng=None,
    )
    m = int(mask.sum(1)[0])
    assert (mask.sum(1) == m).all() and 1 < m < n_frames

    masked_pos = np.stack([np.nonzero(mask[b])[0] for b in range(B)]
                          ).astype(np.int32)
    neg_idxs = rng.integers(0, m - 1, size=(B, m, N_NEG))
    neg_idxs = (neg_idxs + (neg_idxs >= np.arange(m)[None, :, None])
                ).astype(np.int32)

    # inject our negatives into the reference (its draw is torch-RNG)
    def fake_sample_negatives(y, num, padding_count=None):
        # y: [B, M, D] -> negs [N, B, M, D] with negs[n,b,m]=y[b,idx[b,m,n]]
        idx = torch.from_numpy(neg_idxs.astype(np.int64))  # [B, M, N]
        gathered = torch.stack(
            [y[b][idx[b].reshape(-1)].reshape(num, N_NEG, -1)
             for b in range(y.size(0))])  # [B, M, N, D]
        return gathered.permute(2, 0, 1, 3), None

    model.sample_negatives = fake_sample_negatives
    with torch.no_grad():
        ref = model(
            source=torch.from_numpy(wav),
            padding_mask=torch.zeros((B, T_WAV), dtype=torch.bool),
            mask=True,
            mask_indices=torch.from_numpy(mask),
        )
    ref_logits = ref["x"].numpy()  # [1+N, B, M]

    module = Wav2Vec2PretrainModule(
        dim=96, layers=2, heads=4, ffn_dim=192, final_dim=32,
        latent_vars=24, latent_groups=2, conv_feature_layers=CONV_SPEC,
        feature_grad_mult=1.0, dropout_input=0.0, dropout_features=0.0,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        layerdrop=0.0,
    )
    variables = convert_wav2vec2_pretrain_state(model.state_dict(), layers=2)
    out = module.apply(
        variables, jnp.asarray(wav), jnp.full((B,), T_WAV, jnp.int32),
        jnp.asarray(mask), jnp.asarray(masked_pos),
        jnp.ones((B, m), bool), jnp.asarray(neg_idxs),
        temp=2.0, deterministic=True,
    )
    logits = np.asarray(out["logits"])  # [B, M, 1+N]
    assert logits.shape == (B, m, 1 + N_NEG)

    ref_bmk = np.transpose(ref_logits, (1, 2, 0))  # [B, M, 1+N]
    finite = np.isfinite(ref_bmk)
    # duplicate-of-positive -inf masking agrees exactly
    np.testing.assert_array_equal(np.isfinite(logits), finite)
    np.testing.assert_allclose(
        logits[finite], ref_bmk[finite], atol=2e-3)

    np.testing.assert_allclose(
        float(out["features_pen"]), float(ref["features_pen"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(out["prob_perplexity"]), float(ref["prob_perplexity"]),
        rtol=1e-4)
    np.testing.assert_allclose(
        float(out["code_perplexity"]), float(ref["code_perplexity"]),
        rtol=1e-4)

    # criterion parity: infonce CE(target 0) + [0.1, 10] extra losses
    # (wav2vec_criterion.py:68-110), normalized by sample_size
    from diffnorm_tpu.criterions.wav2vec_loss import Wav2VecLoss

    ce_ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(ref_logits).permute(1, 2, 0).reshape(-1, 1 + N_NEG),
        torch.zeros(B * m, dtype=torch.long), reduction="sum").item()
    sample_size = B * m
    nvars = 24 * 2
    loss_ref = (
        ce_ref
        + 0.1 * (nvars - float(ref["prob_perplexity"])) / nvars * sample_size
        + 10.0 * float(ref["features_pen"]) * sample_size
    ) / sample_size

    class _Holder:
        apply = staticmethod(module.apply)

    crit = Wav2VecLoss(Config())
    batch = {
        "src_tokens": jnp.asarray(wav),
        "src_lengths": jnp.full((B,), T_WAV, jnp.int32),
        "mask_indices": jnp.asarray(mask),
        "masked_pos": jnp.asarray(masked_pos),
        "masked_valid": jnp.ones((B, m), bool),
        "neg_idxs": jnp.asarray(neg_idxs),
        "gumbel_temp": jnp.float32(2.0),
    }
    loss, metrics, _ = crit(_Holder(), variables, batch,
                            jax.random.PRNGKey(0), train=False)
    assert int(metrics["sample_size"]) == sample_size
    np.testing.assert_allclose(float(loss), loss_ref, rtol=1e-4)


def test_wav2vec2_trainer_step_trains():
    """dummy_wav2vec2 through the Trainer: host-side mask/negative draws,
    gumbel ST estimator — one step is finite and moves the codebook,
    the weight_proj, and a deep encoder weight."""
    from diffnorm_tpu.train.trainer import Trainer

    cfg = Config(
        arch="wav2vec2", criterion="wav2vec", task="dummy_wav2vec2",
        conv_feature_layers="[(32,10,5),(32,3,2)]",
        encoder_embed_dim=48, encoder_layers=1, encoder_attention_heads=2,
        encoder_ffn_embed_dim=96, final_dim=16, latent_vars=12,
        latent_groups=2, num_negatives=8, lr=1e-3,
        tokens_per_sample=2000, batch_size=2,
    )
    task = TASKS.get("dummy_wav2vec2").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    trainer = Trainer(make_trainer_config(cfg), task, model, crit)
    batch = task.dummy_batch(2, 2000)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    p0 = jax.device_get(state.params)
    state, mets = trainer.train_step(state, [batch], jax.random.PRNGKey(1))
    assert np.isfinite(float(mets["loss"]))
    p1 = jax.device_get(state.params)

    def leaf(tree, *path):
        node = tree.get("params", tree)
        for p in path:
            node = node[p]
        return node

    for path in (("quantizer", "vars"),
                 ("quantizer", "weight_proj", "kernel"),
                 ("encoder", "layer_0", "fc1", "kernel"),
                 ("project_q", "kernel")):
        assert float(np.abs(leaf(p1, *path) - leaf(p0, *path)).max()) > 0, path


def test_wav2vec2_gumbel_temp_annealing():
    """set_num_updates drives the reference's max(max*decay^n, min)
    schedule (gumbel_vector_quantizer.py:88-91)."""
    cfg = Config(task="dummy_wav2vec2", latent_temp=(2.0, 0.5, 0.9))
    task = TASKS.get("dummy_wav2vec2").setup_task(cfg)
    assert task.gumbel_temp == 2.0
    task.set_num_updates(3)
    np.testing.assert_allclose(task.gumbel_temp, 2.0 * 0.9 ** 3)
    task.set_num_updates(1000)
    assert task.gumbel_temp == 0.5


def test_w2v_path_warm_start(tmp_path):
    """fairseq --w2v-path: the CTC fine-tune model warm-starts its backbone
    from (a) an orbax pretraining checkpoint saved by OUR trainer and
    (b) a torch HubertModel/Wav2Vec2Model .pt; dim mismatches fail loud
    (hubert_asr.py:334-368 semantics)."""
    import pytest

    from diffnorm_tpu.train.checkpoint import CheckpointManager
    from diffnorm_tpu.utils.convert_weights import (
        graft_encoder_params,
        load_pretrained_encoder,
    )

    # --- pretrain one wav2vec2 step and save -----------------------------
    cfg = Config(
        arch="wav2vec2", criterion="wav2vec", task="dummy_wav2vec2",
        conv_feature_layers="[(32,10,5),(32,3,2)]",
        encoder_embed_dim=48, encoder_layers=1, encoder_attention_heads=2,
        encoder_ffn_embed_dim=96, final_dim=16, latent_vars=12,
        latent_groups=2, num_negatives=8, lr=1e-3, tokens_per_sample=2000,
    )
    task = TASKS.get("dummy_wav2vec2").setup_task(cfg)
    model = task.build_model()
    batch = task.dummy_batch(2, 2000)
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    mgr = CheckpointManager(str(tmp_path / "pt"), keep_last=1, keep_best=1)
    mgr.save(3, {"step": 3, "params": jax.device_get(variables["params"])})
    mgr.finalize()

    # --- fine-tune model pulls the encoder from it ------------------------
    ft_cfg = Config(
        arch="hubert_ctc", criterion="ctc", task="dummy_ctc",
        conv_feature_layers="[(32,10,5),(32,3,2)]",
        encoder_embed_dim=48, encoder_layers=1, encoder_attention_heads=2,
        encoder_ffn_embed_dim=96, vocab_size=30,
        w2v_path=str(tmp_path / "pt" / "step_000000003"),
    )
    ft_task = TASKS.get("dummy_ctc").setup_task(ft_cfg)
    ft_model = ft_task.build_model()
    ft_batch = ft_task.dummy_batch(2, 2000)
    ft_vars = ft_task.init_variables(ft_model, jax.random.PRNGKey(1), ft_batch)
    np.testing.assert_array_equal(
        np.asarray(ft_vars["params"]["w2v_model"]["post_extract_proj"]["kernel"]),
        np.asarray(variables["params"]["encoder"]["post_extract_proj"]["kernel"]),
    )
    # forward still works with the grafted params
    out = ft_model.apply(ft_vars, ft_batch["src_tokens"],
                         ft_batch["src_lengths"], deterministic=True)
    assert np.isfinite(np.asarray(out["logits"])).all()

    # --- torch .pt path ----------------------------------------------------
    ref = _build_ref_model()
    pt = tmp_path / "w2v.pt"
    torch.save({"model": ref.state_dict()}, pt)
    enc, mask_emb = load_pretrained_encoder(str(pt), layers=2)
    assert "layer_1" in enc and "post_extract_proj" in enc
    # the learned mask embedding rides along (reference hubert_asr reuses
    # it for apply_mask fine-tuning)
    np.testing.assert_allclose(
        mask_emb, ref.mask_emb.detach().numpy(), rtol=1e-6)

    # --- mismatches fail loud -----------------------------------------------
    with pytest.raises(ValueError, match="does not match"):
        graft_encoder_params(ft_vars, enc)
    with pytest.raises(ValueError, match="transformer layers"):
        load_pretrained_encoder(str(pt), layers=6)


def test_w2v_path_mask_emb_grafted(tmp_path):
    """apply_mask fine-tuning inherits the PRETRAINED mask embedding, not a
    fresh random one (review regression; hubert_asr semantics)."""
    cfg = Config(
        arch="wav2vec2", criterion="wav2vec", task="dummy_wav2vec2",
        conv_feature_layers="[(32,10,5),(32,3,2)]",
        encoder_embed_dim=48, encoder_layers=1, encoder_attention_heads=2,
        encoder_ffn_embed_dim=96, final_dim=16, latent_vars=12,
        latent_groups=2, num_negatives=8, tokens_per_sample=2000,
    )
    task = TASKS.get("dummy_wav2vec2").setup_task(cfg)
    model = task.build_model()
    batch = task.dummy_batch(2, 2000)
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    from diffnorm_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "pt"))
    mgr.save(1, {"step": 1, "params": jax.device_get(variables["params"])})
    mgr.finalize()

    ft_cfg = Config(
        arch="hubert_ctc", criterion="ctc", task="dummy_ctc",
        conv_feature_layers="[(32,10,5),(32,3,2)]",
        encoder_embed_dim=48, encoder_layers=1, encoder_attention_heads=2,
        encoder_ffn_embed_dim=96, vocab_size=30, apply_mask=True,
        mask_prob=0.5, tokens_per_sample=2000,
        w2v_path=str(tmp_path / "pt" / "step_000000001"),
    )
    ft_task = TASKS.get("dummy_ctc").setup_task(ft_cfg)
    ft_model = ft_task.build_model()
    ft_batch = ft_task.prepare_batch(
        ft_task.dummy_batch(2, 2000), np.random.default_rng(0))
    ft_vars = ft_task.init_variables(ft_model, jax.random.PRNGKey(1), ft_batch)
    np.testing.assert_array_equal(
        np.asarray(ft_vars["params"]["mask_emb"]),
        np.asarray(variables["params"]["mask_emb"]))


def test_mask_budget_covers_min_masks_floor():
    """Review regression: mask_budget must cover the min_masks=2 floor and
    non-static span types; tiny mask_prob with short rows used to overflow
    masked_pos (100/100 seeds)."""
    cfg = Config(task="dummy_wav2vec2", mask_prob=0.1, mask_length=10,
                 num_negatives=4, conv_feature_layers="[(32,10,5),(32,3,2)]")
    task = TASKS.get("dummy_wav2vec2").setup_task(cfg)
    for seed in range(20):
        rng = np.random.default_rng(seed)
        batch = {
            "src_tokens": rng.normal(size=(2, 6000)).astype(np.float32),
            "src_lengths": np.asarray([6000, 5000], np.int32),
        }
        out = task.prepare_batch(batch, rng)
        assert out["masked_pos"].shape == out["masked_valid"].shape
        assert out["mask_indices"].sum(1).max() <= out["masked_pos"].shape[1]

    # normal span lengths are unbounded -> budget falls back to all frames
    cfg2 = Config(task="dummy_wav2vec2", mask_selection="normal",
                  mask_other=3.0, mask_prob=0.1, mask_length=10)
    task2 = TASKS.get("dummy_wav2vec2").setup_task(cfg2)
    assert task2.mask_budget(120) == 120


def test_layer_norm_extractor_matches_reference():
    """extractor_mode=layer_norm (wav2vec2-large/XLSR: per-layer channel
    LayerNorm + conv biases, wav2vec2.py ConvFeatureExtractionModel
    :849-860) — the REAL Wav2Vec2Model's features-only forward must match
    HubertEncoder after conversion, and load_pretrained_encoder must accept
    the layout."""
    from diffnorm_tpu.models.hubert import HubertEncoder
    from diffnorm_tpu.utils.convert_weights import (
        convert_wav2vec2_pretrain_state,
        load_pretrained_encoder,
    )

    w2v = load_wav2vec2()
    cfg = w2v.Wav2Vec2Config()
    cfg.conv_feature_layers = str(list(CONV_SPEC))
    cfg.extractor_mode = "layer_norm"
    cfg.conv_bias = True
    cfg.encoder_embed_dim = 96
    cfg.encoder_layers = 2
    cfg.encoder_attention_heads = 4
    cfg.encoder_ffn_embed_dim = 192
    cfg.final_dim = 32
    cfg.quantize_targets = True
    cfg.latent_vars = 24
    cfg.latent_groups = 2
    cfg.dropout = cfg.attention_dropout = cfg.activation_dropout = 0.0
    cfg.dropout_input = cfg.dropout_features = 0.0
    cfg.encoder_layerdrop = 0.0
    torch.manual_seed(1)
    model = w2v.Wav2Vec2Model(cfg)
    model.eval()

    rng = np.random.default_rng(3)
    wav = (rng.normal(size=(2, 2010)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = model(source=torch.from_numpy(wav), padding_mask=None,
                    mask=False, features_only=True)["x"].numpy()

    variables = convert_wav2vec2_pretrain_state(model.state_dict(), layers=2)
    enc = HubertEncoder(
        dim=96, layers=2, heads=4, ffn_dim=192,
        conv_feature_layers=CONV_SPEC, extractor_mode="layer_norm",
        conv_bias=True,
    )
    out = enc.apply({"params": variables["params"]["encoder"]},
                    jnp.asarray(wav))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)

    # the --w2v-path loader accepts the layout (previously a loud reject)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        pt = td + "/large.pt"
        torch.save({"model": model.state_dict()}, pt)
        enc_params, mask_emb = load_pretrained_encoder(pt, layers=2)
        assert "ln_2" in enc_params["feature_extractor"]
        assert "bias" in enc_params["feature_extractor"]["conv_0"]
        assert mask_emb is not None


def test_layer_norm_first_encoder_matches_reference():
    """Pre-norm stacks (layer_norm_first=True, the LARGE recipes): per-layer
    pre-norm ordering, the encoder-level LayerNorm moving AFTER the stack,
    and its omission on intermediate-layer taps (wav2vec2.py forward
    :1000-1030) — pinned against the REAL Wav2Vec2Model."""
    from diffnorm_tpu.models.hubert import HubertEncoder
    from diffnorm_tpu.utils.convert_weights import (
        convert_wav2vec2_pretrain_state,
    )

    w2v = load_wav2vec2()
    cfg = w2v.Wav2Vec2Config()
    cfg.conv_feature_layers = str(list(CONV_SPEC))
    cfg.extractor_mode = "layer_norm"
    cfg.conv_bias = True
    cfg.layer_norm_first = True
    cfg.encoder_embed_dim = 96
    cfg.encoder_layers = 3
    cfg.encoder_attention_heads = 4
    cfg.encoder_ffn_embed_dim = 192
    cfg.final_dim = 32
    cfg.quantize_targets = True
    cfg.latent_vars = 24
    cfg.latent_groups = 2
    cfg.dropout = cfg.attention_dropout = cfg.activation_dropout = 0.0
    cfg.dropout_input = cfg.dropout_features = 0.0
    cfg.encoder_layerdrop = 0.0
    torch.manual_seed(2)
    model = w2v.Wav2Vec2Model(cfg)
    model.eval()

    rng = np.random.default_rng(4)
    wav = (rng.normal(size=(2, 2010)) * 0.1).astype(np.float32)
    variables = convert_wav2vec2_pretrain_state(model.state_dict(), layers=3)
    enc = HubertEncoder(
        dim=96, layers=3, heads=4, ffn_dim=192,
        conv_feature_layers=CONV_SPEC, extractor_mode="layer_norm",
        conv_bias=True, layer_norm_first=True,
    )
    # full depth (final encoder LN applied) AND an intermediate tap (not)
    for output_layer, ref_layer in ((None, None), (2, 1)):
        with torch.no_grad():
            ref = model(source=torch.from_numpy(wav), padding_mask=None,
                        mask=False, features_only=True,
                        layer=ref_layer)["x"].numpy()
        out = enc.apply({"params": variables["params"]["encoder"]},
                        jnp.asarray(wav), output_layer=output_layer)
        np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4)


def test_single_loss_weight_duplicates():
    """Reference wav2vec_criterion :96-98: one loss_weights entry is
    broadcast across both extra losses."""
    from diffnorm_tpu.criterions.wav2vec_loss import Wav2VecLoss

    crit = Wav2VecLoss(Config(loss_weights=[0.5]))
    assert crit.loss_weights == [0.5, 0.5]
    crit2 = Wav2VecLoss(Config())
    assert crit2.loss_weights == [0.1, 10.0]
