from diffnorm_tpu.data.dictionary import Dictionary  # noqa: F401
