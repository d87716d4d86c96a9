"""wav2vec 2.0 criterion (reference fairseq/criterions/wav2vec_criterion.py
:45-150, infonce=True as in every wav2vec2 recipe): contrastive CE with the
true quantized target at index 0, plus extra model losses scaled by
loss_weights * sample_size — [0.1 * codebook-diversity, 10 * features_pen]
(wav2vec2_base_librispeech.yaml).

sample_size = number of (valid) masked frames; the trainer's
sum-loss/sum-sample_size accumulation reproduces fairseq's normalization.
Static TPU shapes: the CE is weighted by `masked_valid` instead of the
reference's dynamic masked gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffnorm_tpu.registry import register_criterion


@register_criterion("wav2vec")
class Wav2VecLoss:
    def __init__(self, cfg=None, task=None):
        self.cfg = cfg
        lw = (cfg or {}).get("loss_weights", [0.1, 10.0])
        if isinstance(lw, (int, float)):
            lw = [lw]
        lw = [float(w) for w in lw]
        if len(lw) == 1:
            # reference criterion :96-98: a single weight is duplicated
            # across all extra losses (diversity + features_pen)
            lw = lw * 2
        self.loss_weights = lw

    def __call__(self, model, variables, batch, rng, train: bool = True):
        rngs = {"dropout": rng} if train else {}
        out = model.apply(
            variables, batch["src_tokens"], batch["src_lengths"],
            batch["mask_indices"], batch["masked_pos"],
            batch["masked_valid"], batch["neg_idxs"],
            temp=batch.get("gumbel_temp", 2.0),
            deterministic=not train, rngs=rngs,
        )
        logits = out["logits"].astype(jnp.float32)  # [B, M, 1+N]
        w = out["masked_valid"].astype(jnp.float32)  # [B, M]

        # infonce: cross-entropy with target 0 (the true quantized vector)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -logp[..., 0]
        loss_sum = jnp.sum(ce * w)
        sample_size = jnp.maximum(jnp.sum(w), 1.0)

        loss = loss_sum
        # reference get_extra_losses :793-805 ordering: diversity then pen
        extra = [
            (out["num_vars"] - out["prob_perplexity"]) / out["num_vars"],
            out["features_pen"],
        ]
        for coef, p in zip(self.loss_weights, extra):
            if coef != 0:
                loss = loss + coef * p * sample_size

        # accuracy: argmax==0 minus argmin-tie rows (criterion :151-162)
        amax = (jnp.argmax(logits, axis=-1) == 0)
        amin = (jnp.argmin(logits, axis=-1) == 0)
        correct = jnp.sum(jnp.where(out["masked_valid"],
                                    amax & ~(amax & amin), False))

        loss = loss / sample_size
        metrics = {
            "loss": loss,
            "contrastive_loss": loss_sum / sample_size,
            "prob_perplexity": out["prob_perplexity"],
            "code_perplexity": out["code_perplexity"],
            "features_pen": out["features_pen"],
            "temp": jnp.asarray(out["temp"], jnp.float32),
            "correct": correct,
            "count": sample_size,
            "ntokens": sample_size,
            "nsentences": batch["src_tokens"].shape[0],
            "sample_size": sample_size,
        }
        return loss, metrics, {}
