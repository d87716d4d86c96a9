"""Reference task-name aliases.

Registered so `--task` flags from reference workflows resolve unchanged:

* `speech_to_speech` (fairseq/tasks/speech_to_speech.py:140) — the base
  S2UT task the reference's AR recipes invoke (`--task speech_to_speech
  --arch s2ut_conformer`); here the AR S2UT task IS that capability (the
  NAR variant keeps its own name, as in the reference).
* `language_modeling` (fairseq/tasks/language_modeling.py) — the unit-LM
  task implements the same token-block dataset + eval_lm surface
  (--sample-break-mode/--tokens-per-sample).
* `dummy_mt` / `dummy_lm` (fairseq/benchmark/dummy_{mt,lm}.py) — synthetic
  benchmark tasks.
"""

from __future__ import annotations

from diffnorm_tpu.registry import TASKS, register_task
from diffnorm_tpu.tasks.ar_s2ut_task import ARS2UTTask
from diffnorm_tpu.tasks.s2spect_task import S2SpectTask
from diffnorm_tpu.tasks.sedd_task import DummyUnitLMTask, UnitLMTask
from diffnorm_tpu.tasks.translation_task import DummyTranslationTask


@register_task("speech_to_speech")
class SpeechToSpeechDispatch:
    """The reference task switches modality on --target-is-code
    (speech_to_speech.py add_args: store_true, default False): units ->
    the AR S2UT task, otherwise the speech-to-spectrogram task."""

    def __new__(cls, cfg):
        if cfg.get("target_is_code", False):
            return ARS2UTTask(cfg)
        return S2SpectTask(cfg)

    @classmethod
    def setup_task(cls, cfg):
        return cls(cfg)


TASKS.register("language_modeling", UnitLMTask)
TASKS.register("dummy_mt", DummyTranslationTask)
TASKS.register("dummy_lm", DummyUnitLMTask)
