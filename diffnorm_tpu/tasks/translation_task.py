"""AR text machine translation — fairseq's flagship "translation" task
(fairseq/tasks/translation.py): bitext pairs (plain `{split}.{src}/{tgt}`
line files or fairseq-preprocess binarized `{split}.{src}-{tgt}.*.bin`),
teacher-forced training with eos-shifted prev_output_tokens
(fairseq/data/language_pair_dataset.py collate move_eos_to_beginning), and
beam-search generation through generate/beam_search.py (whose loop is
hypothesis-for-hypothesis parity-tested against the verbatim reference
sequence_generator.py). Pairs with --arch transformer /
transformer_iwslt_de_en / transformer_wmt_en_de_big and --criterion
label_smoothed_cross_entropy.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from diffnorm_tpu.registry import register_task
from diffnorm_tpu.tasks.ar_s2ut_task import shift_right
from diffnorm_tpu.tasks.cmlm_cg_task import CMLMCGTask


@register_task("translation")
class TranslationTask(CMLMCGTask):
    # cli/generate.py dispatches AR beam decoding on this marker
    ar_generation = True

    def prepare_batch(self, batch: Dict[str, np.ndarray],
                      rng: np.random.Generator):
        if "prev_output_tokens" not in batch:
            batch["prev_output_tokens"] = shift_right(batch["target"])
        return batch

    def init_variables(self, model, rng, batch):
        # generate/validate pass a raw collater batch — derive the shifted
        # decoder input if prepare_batch hasn't run yet
        prev = batch.get("prev_output_tokens")
        if prev is None:
            prev = shift_right(batch["target"])
        r_p, r_d = jax.random.split(rng)
        return model.init(
            {"params": r_p, "dropout": r_d},
            batch["src_tokens"], batch["src_lengths"],
            prev, deterministic=True,
        )

    def dummy_batch(self, batch_size: int = 2, seq_len: int = 16) -> Dict:
        rng = np.random.default_rng(0)
        src = rng.integers(4, len(self.src_dict),
                           size=(batch_size, seq_len)).astype(np.int32)
        tgt = rng.integers(4, len(self.tgt_dict),
                           size=(batch_size, seq_len)).astype(np.int32)
        tgt[:, -1] = 2  # EOS
        batch = {
            "src_tokens": src,
            "src_lengths": np.full((batch_size,), seq_len, np.int32),
            "target": tgt,
        }
        return self.prepare_batch(batch, rng)


@register_task("dummy_translation")
class DummyTranslationTask(TranslationTask):
    def load_dataset(self, split: str, epoch: int = 1):
        from diffnorm_tpu.tasks.dummy import _SyntheticDataset

        bsz = self.cfg.get("batch_size", 4)
        seq = self.cfg.get("tokens_per_sample", 16)
        self.datasets[split] = _SyntheticDataset(
            lambda: self.dummy_batch(bsz, seq), self.cfg.get("dataset_size", 8)
        )
