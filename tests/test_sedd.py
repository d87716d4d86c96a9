"""SEDD: noise schedule, perturbation statistics, loss finiteness, reverse
sampling resolves all masks, token-block LM dataset."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.sedd import loglinear_sigma, sedd_sample
from diffnorm_tpu.registry import TASKS


def tiny_cfg():
    return Config(
        arch="sedd_absorb", criterion="sedd_loss", sedd_dim=16, sedd_depth=1,
        sedd_heads=2, target_code_size=12, lr=1e-4,
    )


@pytest.fixture(scope="module")
def built():
    cfg = tiny_cfg()
    task = TASKS.get("dummy_sedd").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    batch = task.dummy_batch(2, 10)
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    return task, model, crit, batch, variables


def test_loglinear_sigma():
    s0, d0 = loglinear_sigma(jnp.asarray([1e-3]))
    s1, d1 = loglinear_sigma(jnp.asarray([1.0]))
    assert float(s0[0]) < 0.01
    assert float(s1[0]) > 5.0  # -log(eps) with eps=1e-3
    assert float(d0[0]) > 0 and float(d1[0]) > 0


def test_perturb_masks_more_at_high_t(built):
    task, model, crit, batch, variables = built
    module = model.module
    tokens = jnp.asarray(batch["target_unit"])
    lo = model.module.apply(
        variables, tokens, jnp.full((2,), 0.01), jax.random.PRNGKey(0),
        method=type(module).perturb,
    )
    hi = module.apply(
        variables, tokens, jnp.full((2,), 0.99), jax.random.PRNGKey(0),
        method=type(module).perturb,
    )
    mask_id = module.vocab_size
    assert int((np.asarray(hi) == mask_id).sum()) >= int(
        (np.asarray(lo) == mask_id).sum()
    )


def test_sedd_loss_finite(built):
    task, model, crit, batch, variables = built
    loss, mets, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                         train=False)
    assert np.isfinite(float(loss))
    assert float(mets["n_masked"]) >= 0


def test_sedd_sampling_resolves_masks(built):
    task, model, crit, batch, variables = built
    tokens = sedd_sample(
        model, variables, batch_size=2, seq_len=8,
        rng=jax.random.PRNGKey(0), steps=8,
    )
    tokens = np.asarray(tokens)
    mask_id = model.module.vocab_size
    assert not (tokens == mask_id).any()
    assert (tokens >= 0).all() and (tokens < mask_id).all()


def test_sedd_refine_touches_only_masked(built):
    from diffnorm_tpu.models.sedd import sedd_refine

    task, model, crit, batch, variables = built
    rng = np.random.default_rng(0)
    toks = rng.integers(4, 16, size=(2, 8)).astype(np.int32)
    unk_at = np.zeros((2, 8), bool)
    unk_at[0, [1, 4, 5]] = True
    unk_at[1, [0, 7]] = True
    canvas = np.where(unk_at, 3, toks)
    valid = jnp.ones((2, 8), bool)
    out = np.asarray(sedd_refine(
        model, variables, jnp.asarray(canvas), valid,
        jax.random.PRNGKey(0), steps=4,
    ))
    mask_id = model.module.vocab_size
    # untouched positions preserved; all placeholders resolved to data units
    np.testing.assert_array_equal(out[~unk_at], canvas[~unk_at])
    assert (out[unk_at] != 3).all() and (out[unk_at] < mask_id).all()


def test_unit_lm_token_blocks():
    from diffnorm_tpu.data.unit_lm_dataset import UnitLMDataset

    seqs = [np.arange(5, dtype=np.int32), np.arange(3, dtype=np.int32),
            np.arange(7, dtype=np.int32)]
    ds = UnitLMDataset(seqs, block_size=6, is_train=False)
    # 15 tokens total -> 3 blocks of <=6
    assert len(ds) == 3
    total = sum(len(ds[i]["units"]) for i in range(len(ds)))
    assert total == 15
    batch = ds.collater([ds[0], ds[1]])
    assert batch["target_unit"].shape[0] == 2
