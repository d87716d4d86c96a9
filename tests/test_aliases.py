"""Reference-name registry aliases resolve to the right implementations
(tasks/aliases.py, criterions/aliases.py)."""

import diffnorm_tpu.criterions  # noqa: F401 — populate registries
import diffnorm_tpu.tasks  # noqa: F401

from diffnorm_tpu.config import Config
from diffnorm_tpu.registry import CRITERIONS, TASKS


def test_task_aliases_resolve():
    from diffnorm_tpu.tasks.ar_s2ut_task import ARS2UTTask
    from diffnorm_tpu.tasks.s2spect_task import S2SpectTask
    from diffnorm_tpu.tasks.sedd_task import UnitLMTask

    # speech_to_speech dispatches on --target-is-code (reference
    # speech_to_speech.py add_args: default False = spectrogram target)
    disp = TASKS.get("speech_to_speech")
    assert isinstance(
        disp.setup_task(Config(target_is_code=True, target_code_size=10)),
        ARS2UTTask)
    assert isinstance(disp.setup_task(Config()), S2SpectTask)
    assert TASKS.get("language_modeling") is UnitLMTask
    assert "dummy_mt" in TASKS and "dummy_lm" in TASKS


def test_cross_entropy_alias_defaults_unsmoothed():
    ce = CRITERIONS.get("cross_entropy")(Config())
    assert ce.eps == 0.0
    ce = CRITERIONS.get("cross_entropy")(Config(label_smoothing=0.1))
    assert ce.eps == 0.1


def test_nat_loss_dispatches_on_arch():
    from diffnorm_tpu.criterions.levenshtein_loss import LevenshteinLoss
    from diffnorm_tpu.criterions.nar_loss import NARSpeechToUnitLoss

    lev = CRITERIONS.get("nat_loss")(Config(arch="levenshtein_transformer"))
    nar = CRITERIONS.get("nat_loss")(Config(arch="cmlm_transformer"))
    assert isinstance(lev, LevenshteinLoss)
    assert isinstance(nar, NARSpeechToUnitLoss)


def test_tts_criterion_aliases():
    from diffnorm_tpu.criterions.tts_loss import FastSpeech2Loss, Tacotron2Loss

    assert CRITERIONS.get("tacotron2") is Tacotron2Loss
    assert CRITERIONS.get("fastspeech2") is FastSpeech2Loss


def test_unit_to_speech_task_dispatches_to_gan_cli(monkeypatch):
    """fairseq-train --task unit_to_speech/repr_to_speech reaches the GAN
    vocoder trainer (cli/train.py dispatch; reference code_hifigan.py /
    repr_hifigan_task.py train a GAN the optimizer Trainer does not model)."""
    from diffnorm_tpu.cli import train, train_vocoder

    seen = {}

    def fake_main(cfg):
        seen["input_type"] = cfg.get("input_type", "code")
        return 0

    monkeypatch.setattr(train_vocoder, "main", fake_main)
    rc = train.main(Config(task="unit_to_speech", cpu=True))
    assert rc == 0 and seen["input_type"] == "code"
    rc = train.main(Config(task="repr_to_speech", cpu=True))
    assert rc == 0 and seen["input_type"] == "features"


def test_hydra_train_shim_rewrites_overrides(monkeypatch):
    """cli/hydra_train.py: hydra-style dotted key=value overrides become
    --key value flags before delegating to the train CLI."""
    import sys

    from diffnorm_tpu.cli import hydra_train, train

    seen = {}

    def fake_main(cfg=None):
        seen["argv"] = list(sys.argv[1:])
        return 0

    monkeypatch.setattr(train, "main", fake_main)
    monkeypatch.setattr(
        sys, "argv",
        ["prog", "task.data=/x", "optimization.lr=[5e-4]",
         "--cpu", "criterion=ctc"],
    )
    assert hydra_train.main() == 0
    assert seen["argv"] == ["--data", "/x", "--lr", "5e-4",
                            "--cpu", "--criterion", "ctc"]
