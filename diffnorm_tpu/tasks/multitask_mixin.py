"""Shared --multitask-config-yaml task plumbing (reference
fairseq/tasks/speech_to_speech.py:229-245 multitask setup + :511-516
set_multitask_loss_weight): config parsing, first-pass-decoder selection,
static aux-head specs, per-task loss-weight schedules, and dataset joins.

Used by both the unit-target S2UT tasks (tasks/nar_s2ut_task.py,
tasks/ar_s2ut_task.py) and the spectrogram-target S2ST task
(tasks/s2spect_task.py) — the reference shares the same machinery across
SpeechToSpeechTask regardless of --target-is-code.
"""

from __future__ import annotations

import numpy as np


class MultitaskTaskMixin:
    """Mixin over Task: call `_init_multitask(cfg)` from __init__ and
    `attach_multitask(ds, split)` from load_dataset."""

    def _init_multitask(self, cfg):
        self.multitask_tasks = {}
        self.multitask_config = None
        self._num_updates = 0
        mt_yaml = cfg.get("multitask_config_yaml")
        if mt_yaml:
            import os

            from diffnorm_tpu.data.multitask import MultitaskConfig

            if not os.path.isabs(mt_yaml):
                mt_yaml = os.path.join(self.data_path(1), mt_yaml)
            self.multitask_config = MultitaskConfig(mt_yaml)
            self.multitask_tasks = self.multitask_config.get_all_tasks()

    @property
    def mt_task_name(self):
        """Name of the first-pass (UnitY/Translatotron2 MT) decoder task, or
        None (reference s2s_conformer_unity.py:160-165 selects it via
        task_obj.is_first_pass_decoder / data_cfg first-pass index)."""
        if self.multitask_config is None:
            return None
        idx = self.multitask_config.first_pass_decoder_task_index
        if idx < 0:
            return None
        return list(self.multitask_tasks)[idx]

    def aux_task_specs(self):
        """Static AuxTaskSpec tuple for the model's aux decoders (reference
        build_multitask_decoder + base_multitask_text_transformer_decoder_arch
        defaults, s2s_transformer.py:171-230,582-616)."""
        from diffnorm_tpu.models.nar_transformer import AuxTaskSpec

        specs = []
        for name, tc in self.multitask_tasks.items():
            dargs = tc.decoder_args
            vocab = len(tc.tgt_dict) if tc.tgt_dict is not None else 0
            assert vocab > 0, f"multitask '{name}': missing dictionary"
            specs.append(AuxTaskSpec(
                name=name,
                decoder_type=tc.decoder_type,
                vocab_size=vocab,
                input_from=tc.input_from,
                input_layer=tc.input_layer,
                decoder_layers=int(dargs.get("decoder_layers", 2)),
                decoder_dim=int(dargs.get("decoder_embed_dim", 256)),
                decoder_heads=int(dargs.get("decoder_attention_heads", 4)),
                decoder_ffn_dim=int(dargs.get("decoder_ffn_embed_dim", 2048)),
                dropout=float(dargs.get("dropout", 0.3)),
            ))
        return tuple(specs)

    def set_num_updates(self, num_updates: int):
        """Drives the per-task loss-weight decay schedule host-side
        (reference speech_to_speech.py:511-516 set_multitask_loss_weight)."""
        self._num_updates = int(num_updates)

    def attach_multitask(self, ds, split: str):
        """Join each aux task's per-sample text targets onto the dataset."""
        for name, tc in self.multitask_tasks.items():
            from diffnorm_tpu.data.multitask import TextTargetData

            ds.add_multitask(name, TextTargetData(tc, split), tc.decoder_type)

    def inject_loss_weights(self, batch):
        """Per-task loss weights (fixed or linearly decaying with
        num_updates) as traced scalars: the decay schedule moving never
        retraces the step."""
        for name, tc in self.multitask_tasks.items():
            if "multitask" in batch and name in batch["multitask"]:
                batch["multitask"][name]["loss_weight"] = np.float32(
                    tc.get_loss_weight(self._num_updates)
                )

    def multitask_prev(self, batch):
        """{task: prev_output_tokens} for transformer aux decoders."""
        out = {}
        for name, tc in self.multitask_tasks.items():
            mt = batch.get("multitask", {}).get(name)
            if mt is not None and "prev_output_tokens" in mt:
                out[name] = mt["prev_output_tokens"]
        return out or None

    def first_pass_prev_tokens(self, batch, pad: int = 1, eos: int = 2):
        """prev_output_tokens for the first-pass decoder, or a 2-step stub
        when the split lacks first-pass text (generation-time init: the
        model's param shapes don't depend on its length)."""
        mt = batch.get("multitask", {}).get(self.mt_task_name, {})
        prev_mt = mt.get("prev_output_tokens")
        if prev_mt is None:
            # unit targets live in "target"; spectrogram targets in "feat_tgt"
            tgt = batch.get("target")
            if tgt is None:
                tgt = batch["feat_tgt"]
            b = tgt.shape[0]
            prev_mt = np.full((b, 2), pad, np.int32)
            prev_mt[:, 0] = eos
        return prev_mt
