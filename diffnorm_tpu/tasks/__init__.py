"""Tasks. Importing populates the task registry."""

from diffnorm_tpu.tasks import vae_task  # noqa: F401
from diffnorm_tpu.tasks import diffusion_task  # noqa: F401
from diffnorm_tpu.tasks import nar_s2ut_task  # noqa: F401
from diffnorm_tpu.tasks import ar_s2ut_task  # noqa: F401
from diffnorm_tpu.tasks import sedd_task  # noqa: F401
from diffnorm_tpu.tasks import cmlm_cg_task  # noqa: F401
from diffnorm_tpu.tasks import levenshtein_task  # noqa: F401
from diffnorm_tpu.tasks import dummy  # noqa: F401
from diffnorm_tpu.tasks import tts_task  # noqa: F401
from diffnorm_tpu.tasks import translation_task  # noqa: F401
from diffnorm_tpu.tasks import s2t_task  # noqa: F401
from diffnorm_tpu.tasks import s2spect_task  # noqa: F401
from diffnorm_tpu.tasks import hubert_pretrain_task  # noqa: F401
from diffnorm_tpu.tasks import audio_pretrain_task  # noqa: F401
from diffnorm_tpu.tasks import aliases  # noqa: F401
from diffnorm_tpu.tasks.base import Task  # noqa: F401
