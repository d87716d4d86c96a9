"""Criterions (losses). Importing populates the criterion registry."""

from diffnorm_tpu.criterions import vae_loss  # noqa: F401
from diffnorm_tpu.criterions import ddpm_loss  # noqa: F401
from diffnorm_tpu.criterions import nar_loss  # noqa: F401
from diffnorm_tpu.criterions import ce_loss  # noqa: F401
from diffnorm_tpu.criterions import sedd_loss  # noqa: F401
from diffnorm_tpu.criterions import levenshtein_loss  # noqa: F401
from diffnorm_tpu.criterions import tts_loss  # noqa: F401
from diffnorm_tpu.criterions import aliases  # noqa: F401
from diffnorm_tpu.criterions.label_smoothing import label_smoothed_nll_loss  # noqa: F401
from diffnorm_tpu.criterions import ctc_loss  # noqa: F401
from diffnorm_tpu.criterions import hubert_loss  # noqa: F401
from diffnorm_tpu.criterions import wav2vec_loss  # noqa: F401
