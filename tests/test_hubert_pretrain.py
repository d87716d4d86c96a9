"""HuBERT pretraining parity against the REAL reference modules.

* compute_mask_indices (utils/masking.py) pinned bit-for-bit against the
  verbatim fairseq/data/data_utils.py:393-527 on a shared global-np.random
  stream — every mask_type, with/without padding, min_masks, and the
  no_overlap recursive branch (run under an `np.int = int` shim; the
  reference line 488 uses the alias numpy 2 removed).
* The static-shaped [B, F, K] cosine-logit formulation of
  HubertPretrainModule (models/hubert.py) pinned against the REAL
  HubertModel forward (fairseq/models/hubert/hubert.py:429-527): the
  reference's dynamic-gather (K+1)-way NCE logits with duplicate-of-positive
  masking map exactly onto our K-way rows, and the criterion losses match.
* One real trainer step on the dummy_hubert task (masks drawn host-side in
  prepare_batch) trains: finite loss, params move.
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from reference_loader import load_data_utils, load_hubert

from diffnorm_tpu.config import Config, make_trainer_config
from diffnorm_tpu.registry import TASKS
from diffnorm_tpu.utils.masking import compute_mask_indices

B, T_WAV = 2, 2010  # -> 100 conv frames with the small spec below (even,
CONV_SPEC = ((64, 10, 5), (64, 3, 2), (64, 2, 2))  # so no seq-multiple pad)
K = 11  # label classes


@pytest.mark.parametrize(
    "mask_type,mask_other,with_pad,no_overlap",
    [
        ("static", 0.0, False, False),
        ("static", 0.0, True, False),
        ("uniform", 2.0, True, False),
        ("normal", 3.0, False, False),
        ("poisson", 0.0, True, False),
        ("static", 0.0, True, True),
    ],
)
def test_compute_mask_indices_matches_reference(
    mask_type, mask_other, with_pad, no_overlap
):
    du = load_data_utils()
    shape = (4, 120)
    padding = np.zeros(shape, bool)
    if with_pad:
        padding[1, 90:] = True
        padding[3, 40:] = True

    if no_overlap:
        np.int = int  # reference data_utils.py:488 uses the removed alias
    try:
        for seed in (0, 7, 123):
            np.random.seed(seed)
            ref = du.compute_mask_indices(
                shape, torch.from_numpy(padding), mask_prob=0.65,
                mask_length=6, mask_type=mask_type, mask_other=mask_other,
                min_masks=2, no_overlap=no_overlap, min_space=1,
            )
            np.random.seed(seed)
            mine = compute_mask_indices(
                shape, padding, mask_prob=0.65, mask_length=6,
                mask_type=mask_type, mask_other=mask_other, min_masks=2,
                no_overlap=no_overlap, min_space=1, rng=None,
            )
            np.testing.assert_array_equal(mine, ref)
    finally:
        if no_overlap:
            del np.int


def _build_ref_model():
    hub = load_hubert()
    du = load_data_utils()
    # hubert.py imported compute_mask_indices from the stubbed
    # fairseq.data.data_utils; rebind the REAL one for the pretraining draw
    hub.compute_mask_indices = du.compute_mask_indices

    cfg = hub.HubertConfig()
    cfg.conv_feature_layers = str(list(CONV_SPEC))
    cfg.encoder_embed_dim = 96
    cfg.encoder_layers = 2
    cfg.encoder_attention_heads = 4
    cfg.encoder_ffn_embed_dim = 192
    cfg.final_dim = 32
    cfg.label_rate = 800  # 16000 / (5*2*2) -> feat2tar_ratio = 1.0
    cfg.dropout = 0.0
    cfg.attention_dropout = 0.0
    cfg.activation_dropout = 0.0
    cfg.dropout_input = 0.0
    cfg.dropout_features = 0.0
    cfg.encoder_layerdrop = 0.0
    cfg.feature_grad_mult = 1.0
    cfg.skip_masked = False
    cfg.skip_nomask = False
    task_cfg = types.SimpleNamespace(sample_rate=16000, normalize=False,
                                     data="")

    class _Dict:
        def __len__(self):
            return K

    torch.manual_seed(0)
    model = hub.HubertModel(cfg, task_cfg, [_Dict()])
    model.eval()
    return model


def test_hubert_pretrain_forward_matches_reference():
    """The reference gathers masked frames and builds (K+1)-way NCE logits
    [positive; every label embedding] with duplicate-of-positive rows set
    to -inf (hubert.py compute_nce :378-388, compute_pred :478-490). Our
    module emits one static [B, F, K] cosine tensor; this pins the exact
    row mapping: mine[i, t_i] == ref[i, 0], mine[i, c] == ref[i, 1+c]
    (c != t_i), ref[i, 1+t_i] == -inf, and the masked/unmasked CE sums and
    features_pen agree with the real criterion formula
    (hubert_criterion.py:54-105)."""
    from diffnorm_tpu.criterions.hubert_loss import HubertLoss
    from diffnorm_tpu.models.hubert import HubertPretrainModule
    from diffnorm_tpu.utils.convert_weights import (
        convert_hubert_pretrain_state,
    )

    model = _build_ref_model()
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(B, T_WAV)) * 0.1).astype(np.float32)
    n_frames = 100
    target = rng.integers(0, K, size=(B, n_frames)).astype(np.int64)
    pad = torch.zeros((B, T_WAV), dtype=torch.bool)

    np.random.seed(11)
    with torch.no_grad():
        ref = model(
            source=torch.from_numpy(wav),
            target_list=[torch.from_numpy(target)],
            padding_mask=pad,
            mask=True,
        )
    logit_m_ref = ref["logit_m_list"][0].numpy()  # [S_m, K+1]
    logit_u_ref = ref["logit_u_list"][0].numpy()  # [S_u, K+1]

    # same global-np.random stream -> identical span masks (the reference
    # passes the frame-level padding mask and min_masks=2, apply_mask
    # :338-350)
    np.random.seed(11)
    mask_indices = compute_mask_indices(
        (B, n_frames), np.zeros((B, n_frames), bool),
        mask_prob=model.mask_prob, mask_length=model.mask_length,
        min_masks=2, rng=None,
    )
    assert 0 < mask_indices.sum() < B * n_frames

    module = HubertPretrainModule(
        num_classes=K, dim=96, layers=2, heads=4, ffn_dim=192,
        final_dim=32, conv_feature_layers=CONV_SPEC,
        feature_grad_mult=1.0, dropout_input=0.0, dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0, layerdrop=0.0,
    )
    variables = convert_hubert_pretrain_state(model.state_dict(), layers=2)
    out = module.apply(
        variables, jnp.asarray(wav),
        jnp.full((B,), T_WAV, jnp.int32),
        jnp.asarray(mask_indices), deterministic=True,
    )
    logits = np.asarray(out["logits"])  # [B, F, K]
    assert logits.shape == (B, n_frames, K)

    # row mapping at masked positions (row-major boolean gather order)
    for sel, ref_rows in ((mask_indices, logit_m_ref),
                          ((~mask_indices), logit_u_ref)):
        mine_rows = logits[sel]
        tgts = target[sel]
        assert mine_rows.shape[0] == ref_rows.shape[0]
        for i in range(mine_rows.shape[0]):
            t = int(tgts[i])
            assert ref_rows[i, 1 + t] == -np.inf
            np.testing.assert_allclose(
                mine_rows[i, t], ref_rows[i, 0], atol=2e-3)
            keep = np.arange(K) != t
            np.testing.assert_allclose(
                mine_rows[i, keep], ref_rows[i, 1:][keep], atol=2e-3)

    np.testing.assert_allclose(
        float(out["features_pen"]), float(ref["features_pen"]), rtol=1e-5)

    # criterion parity: reference hubert_criterion.py computes
    # sum-CE(logit_m, 0) + coef * features_pen * sample_size, normalized by
    # sample_size = masked-frame count
    ce_m_ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logit_m_ref),
        torch.zeros(logit_m_ref.shape[0], dtype=torch.long),
        reduction="sum",
    ).item()
    s_m = logit_m_ref.shape[0]
    loss_ref = (ce_m_ref + 10.0 * float(ref["features_pen"]) * s_m) / s_m

    class _Holder:
        apply = staticmethod(module.apply)

    crit = HubertLoss(Config(loss_weights=[10.0]))
    batch = {
        "src_tokens": jnp.asarray(wav),
        "src_lengths": jnp.full((B,), T_WAV, jnp.int32),
        "target": jnp.asarray(target),
        "mask_indices": jnp.asarray(mask_indices),
    }
    loss, metrics, _ = crit(_Holder(), variables, batch,
                            jax.random.PRNGKey(0), train=False)
    assert int(metrics["sample_size"]) == s_m
    np.testing.assert_allclose(float(loss), loss_ref, rtol=1e-4)
    # reference logs corr_m/count_m as argmax==0 (minus argmin ties)
    corr_ref = int(
        (torch.from_numpy(logit_m_ref).argmax(-1) == 0).sum().item())
    assert int(metrics["correct_m"]) == corr_ref


def test_hubert_trainer_step_trains():
    """dummy_hubert task end-to-end through the Trainer: prepare_batch
    draws the span mask host-side, one grad step is finite and moves the
    encoder AND the label embeddings."""
    from diffnorm_tpu.train.trainer import Trainer

    cfg = Config(
        arch="hubert", criterion="hubert", task="dummy_hubert",
        target_code_size=24, conv_feature_layers="[(32,10,5),(32,3,2)]",
        encoder_embed_dim=48, encoder_layers=1, encoder_attention_heads=2,
        encoder_ffn_embed_dim=96, final_dim=16, lr=1e-3,
        tokens_per_sample=2000, batch_size=2,
    )
    task = TASKS.get("dummy_hubert").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    trainer = Trainer(make_trainer_config(cfg), task, model, crit)
    batch = task.dummy_batch(2, 2000)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    p0 = jax.device_get(state.params)
    state, mets = trainer.train_step(state, [batch], jax.random.PRNGKey(1))
    assert np.isfinite(float(mets["loss"]))
    p1 = jax.device_get(state.params)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), p0, p1)
    leaves = jax.tree_util.tree_leaves(moved)
    assert max(leaves) > 0
    # label embeddings and a deep encoder weight both receive gradient
    def leaf(tree, *path):
        node = tree.get("params", tree)
        for p in path:
            node = node[p]
        return node

    assert float(np.abs(leaf(p1, "label_embs_concat")
                        - leaf(p0, "label_embs_concat")).max()) > 0
    assert float(np.abs(
        leaf(p1, "encoder", "layer_0", "fc1", "kernel")
        - leaf(p0, "encoder", "layer_0", "fc1", "kernel")).max()) > 0
