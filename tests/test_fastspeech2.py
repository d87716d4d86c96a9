"""FastSpeech2 TTS: length regulation, forward shapes, generation wrapper."""

import jax
import jax.numpy as jnp
import numpy as np

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.fastspeech2 import (
    FastSpeech2Model,
    NonARSpeechGenerator,
    length_regulate,
)


def test_length_regulate():
    x = jnp.asarray(np.arange(6, dtype=np.float32).reshape(1, 3, 2))
    durations = jnp.asarray([[2, 1, 3]])
    out, mask = length_regulate(x, durations, max_frames=8)
    assert out.shape == (1, 8, 2)
    # frames: [t0, t0, t1, t2, t2, t2, pad...]
    np.testing.assert_array_equal(np.asarray(out[0, :, 0]),
                                  [0, 0, 2, 4, 4, 4, 4, 4])
    np.testing.assert_array_equal(np.asarray(mask[0]),
                                  [1, 1, 1, 1, 1, 1, 0, 0])


def test_fastspeech2_forward_and_generate():
    cfg = Config(
        arch="fastspeech2_base", vocab_size=30, encoder_embed_dim=16,
        encoder_ffn_embed_dim=32, encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=2, output_frame_dim=20,
        max_target_positions=32,
    )
    model = FastSpeech2Model.build_model(cfg)
    tokens = jnp.asarray([[5, 6, 7, 1]], jnp.int32)
    durations = jnp.asarray([[2, 2, 3, 0]], jnp.int32)
    variables = model.module.init(
        jax.random.PRNGKey(0), tokens, durations=durations
    )
    out = model.module.apply(variables, tokens, durations=durations)
    assert out["mel_post"].shape == (1, 32, 20)
    assert out["log_dur"].shape == (1, 4)
    assert int(np.asarray(out["frame_mask"]).sum()) == 7

    gen = NonARSpeechGenerator(model, variables)
    res = gen.generate(np.asarray(tokens))
    assert res["feature"].shape == (1, 32, 20)
