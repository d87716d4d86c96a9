"""HuBERT pretraining criterion (reference fairseq/criterions/
hubert_criterion.py:54-133): masked-frame CE (pred_masked_weight) +
optional unmasked-frame CE (pred_nomask_weight) + extra losses from the
model (features_pen, scaled by loss_weights and the sample size).

sample_size = number of masked (valid) frames, exactly the reference's
`targ_m_list[0].numel()` — the trainer's sum-loss/sum-sample_size
accumulation then reproduces fairseq's gradient normalization.

TPU design: the model emits static-shaped [B, F, K] cosine logits for all
frames (models/hubert.py HubertPretrainModule); the CE is weighted by the
masked/unmasked valid positions instead of gathering dynamic-shaped frame
subsets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffnorm_tpu.registry import register_criterion


@register_criterion("hubert")
class HubertLoss:
    def __init__(self, cfg=None, task=None):
        self.cfg = cfg
        self.pred_masked_weight = float(
            (cfg or {}).get("pred_masked_weight", 1.0))
        self.pred_nomask_weight = float(
            (cfg or {}).get("pred_nomask_weight", 0.0))
        # reference hubert-base recipe: loss_weights=[10] on features_pen
        lw = (cfg or {}).get("loss_weights", [10.0])
        if isinstance(lw, (int, float)):
            lw = [lw]
        self.feature_pen_weight = float(lw[0]) if lw else 0.0

    def __call__(self, model, variables, batch, rng, train: bool = True):
        src = batch["src_tokens"]
        src_lengths = batch["src_lengths"]
        target = batch["target"]
        mask_indices = batch["mask_indices"]

        rngs = {"dropout": rng} if train else {}
        out = model.apply(
            variables, src, src_lengths, mask_indices,
            deterministic=not train, rngs=rngs,
        )
        logits = out["logits"]  # [B, F, K] f32
        valid = out["mask"] & (target >= 0)
        w_m = mask_indices & valid
        w_u = (~mask_indices) & valid

        tgt = jnp.maximum(target, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        pred = jnp.argmax(logits, axis=-1)

        loss_m_sum = jnp.sum(jnp.where(w_m, ce, 0.0))
        loss_u_sum = jnp.sum(jnp.where(w_u, ce, 0.0))
        count_m = jnp.sum(w_m)
        count_u = jnp.sum(w_u)

        loss = 0.0
        sample_size = jnp.zeros((), jnp.int32)
        if self.pred_masked_weight > 0:
            loss = loss + self.pred_masked_weight * loss_m_sum
            sample_size = sample_size + count_m
        if self.pred_nomask_weight > 0:
            loss = loss + self.pred_nomask_weight * loss_u_sum
            sample_size = sample_size + count_u
        sample_size = jnp.maximum(sample_size, 1)
        if self.feature_pen_weight:
            # reference :95-105: coef * extra_loss * sample_size
            loss = loss + (self.feature_pen_weight * out["features_pen"]
                           * sample_size)

        loss = loss / sample_size
        metrics = {
            "loss": loss,
            "loss_m": loss_m_sum / jnp.maximum(count_m, 1),
            "loss_u": loss_u_sum / jnp.maximum(count_u, 1),
            "features_pen": out["features_pen"],
            "correct_m": jnp.sum(jnp.where(w_m, pred == tgt, False)),
            "count_m": count_m,
            "correct_u": jnp.sum(jnp.where(w_u, pred == tgt, False)),
            "count_u": count_u,
            "ntokens": sample_size,
            "nsentences": src.shape[0],
            "sample_size": sample_size,
        }
        return loss, metrics, {}
