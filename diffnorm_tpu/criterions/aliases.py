"""Reference criterion-name aliases.

fairseq registers several criterions under names the recipes and docs use
directly; where this framework already implements the same semantics under
a different name, the reference name is registered here so `--criterion`
flags from reference workflows resolve unchanged:

* `cross_entropy` (fairseq/criterions/cross_entropy.py) — plain CE, i.e.
  label-smoothed CE with epsilon 0 unless --label-smoothing is given.
* `tacotron2` / `fastspeech2` (fairseq/criterions/tacotron2_loss.py:198,
  fastspeech2_loss.py:125) — our tacotron2_loss / fastspeech2_loss.
* `nat_loss` (fairseq/criterions/nat_loss.py, the generic NAT dual-imitation
  criterion used by both levenshtein_transformer and cmlm_transformer
  recipes) — dispatches on the arch: LevT canvases get the deletion/
  insertion/word criterion, mask-predict models the masked-CE criterion.
"""

from __future__ import annotations

from diffnorm_tpu.criterions.ce_loss import LabelSmoothedCrossEntropy
from diffnorm_tpu.criterions.levenshtein_loss import LevenshteinLoss
from diffnorm_tpu.criterions.nar_loss import NARSpeechToUnitLoss
from diffnorm_tpu.criterions.tts_loss import FastSpeech2Loss, Tacotron2Loss
from diffnorm_tpu.registry import CRITERIONS, register_criterion


@register_criterion("cross_entropy")
class CrossEntropy(LabelSmoothedCrossEntropy):
    """Reference `cross_entropy`: no smoothing by default."""

    def __init__(self, cfg=None, task=None):
        super().__init__(cfg, task)
        if cfg is None or "label_smoothing" not in cfg:
            self.eps = 0.0


@register_criterion("nat_loss")
class NatLoss:
    """Arch-dispatching stand-in for fairseq's generic nat_loss."""

    def __new__(cls, cfg=None, task=None):
        arch = str(cfg.get("arch", "")) if cfg is not None else ""
        if "levenshtein" in arch:
            return LevenshteinLoss(cfg, task)
        return NARSpeechToUnitLoss(cfg, task)


CRITERIONS.register("tacotron2", Tacotron2Loss)
CRITERIONS.register("fastspeech2", FastSpeech2Loss)
# speech_to_spectrogram (speech_to_speech_criterion.py:333) IS the
# Tacotron2 criterion applied to the s2spect model (same L1+MSE+eos-BCE
# contract); the 2pass variant belongs to the UnitY two-pass decoder,
# which is out of DiffNorm scope (documented in COMPONENTS.md)
CRITERIONS.register("speech_to_spectrogram", Tacotron2Loss)
