from diffnorm_tpu.utils.masking import lengths_to_mask, lengths_to_padding_mask  # noqa: F401
