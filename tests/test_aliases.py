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


def test_reference_criterion_name_stragglers():
    """ddpm_loss / speech_decoder_loss / unit_to_speech / repr_to_speech
    criterion names resolve (reference ddpm_loss.py:14,
    speech_decoder_loss.py:14, hubert_to_speech.py:57,
    repr_to_speech_loss.py:56)."""
    from diffnorm_tpu.criterions.ddpm_loss import (
        DDPMDiscreteLoss,
        DDPMLatentLoss,
    )

    assert isinstance(CRITERIONS.get("ddpm_loss")(Config()), DDPMLatentLoss)
    sd = CRITERIONS.get("speech_decoder_loss")(Config())
    assert isinstance(sd, DDPMDiscreteLoss)
    assert sd.eps == 0.2  # reference speech_decoder_loss.py:18
    assert CRITERIONS.get("unit_to_speech") is CRITERIONS.get(
        "repr_to_speech")


def test_unit_to_speech_criterion_prices_generator():
    """The registered unit_to_speech criterion computes the generator-side
    45x log-mel L1 (+ duration MSE) on a vocoder batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffnorm_tpu.models.hifigan import CodeGenerator

    gen = CodeGenerator(
        num_embeddings=10, embedding_dim=8,
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
    )
    rng = np.random.default_rng(0)
    code = jnp.asarray(rng.integers(0, 10, size=(2, 16)), jnp.int32)
    wav = jnp.asarray(rng.normal(size=(2, 16 * 8)) * 0.1, jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), code)
    crit = CRITERIONS.get("unit_to_speech")(
        Config(n_fft=64, hop_size=32, win_size=64, num_mels=20))
    loss, metrics, _ = crit(gen, variables, {"code": code, "wav": wav},
                            jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(loss), 45.0 * float(metrics["mel"]),
                               rtol=1e-5)


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
