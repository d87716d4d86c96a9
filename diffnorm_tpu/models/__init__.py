"""Model zoo. Importing this package populates the model/arch registries."""

from diffnorm_tpu.models import vae  # noqa: F401
from diffnorm_tpu.models import diffusion  # noqa: F401
from diffnorm_tpu.models import nar_transformer  # noqa: F401
from diffnorm_tpu.models import ar_transformer  # noqa: F401
from diffnorm_tpu.models import sedd  # noqa: F401
from diffnorm_tpu.models import cmlm_text  # noqa: F401
from diffnorm_tpu.models import levenshtein  # noqa: F401
from diffnorm_tpu.models import fastspeech2  # noqa: F401
from diffnorm_tpu.models import tts_transformer  # noqa: F401
from diffnorm_tpu.models import unit_lm  # noqa: F401
from diffnorm_tpu.models import transformer_text  # noqa: F401
from diffnorm_tpu.models import s2t_transformer  # noqa: F401
from diffnorm_tpu.models import hubert  # noqa: F401
from diffnorm_tpu.models import wav2vec2  # noqa: F401
from diffnorm_tpu.models import s2spect  # noqa: F401
from diffnorm_tpu.models import unity  # noqa: F401
from diffnorm_tpu.models import s2spect2  # noqa: F401
