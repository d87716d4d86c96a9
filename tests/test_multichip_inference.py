"""Mesh-sharded INFERENCE correctness (VERDICT r2 item 2).

The training step is exercised under dp x tp + FSDP by dryrun_multichip;
these tests shard the SERVING graphs — ddim_sample (the DiffNorm
normalization pass, latent_module.py:1385-1471), mask_predict_decode
(iterative_refinement_generator.py:101) and the fused s2st_generate chain —
over the virtual 8-device CPU mesh and assert the sharded outputs match the
single-device outputs token-for-token (float outputs to fp32 tolerance:
partitioned contractions reorder reductions).

jax.random is counter-based, so injected keys draw identical noise under
any sharding — the comparison is exact on the stochastic path too.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from diffnorm_tpu.config import Config
from diffnorm_tpu.parallel.mesh import make_mesh

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices (conftest)")


def _put_dp(mesh, x):
    x = jnp.asarray(x)
    return jax.device_put(
        x, NamedSharding(mesh, P("data", *[None] * (x.ndim - 1))))


def _replicated(mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


@needs_devices
@pytest.mark.slow
def test_ddim_sample_dp_sharded_matches_single():
    """The DDIM normalization graph under 8-way data parallelism."""
    from diffnorm_tpu.models.diffusion import ddim_sample
    from diffnorm_tpu.registry import TASKS

    cfg = Config(
        arch="diff_discrete", criterion="ddpm_discrete_loss",
        hidden_dim=16, latent_dim=3, feature_dim=24, chan_mults=[4],
        vae_decoder_depth=1, vae_decoder_dim_head=8, vae_decoder_heads=2,
        denoiser_depth=1, wavenet_layers=2, wavenet_stacks=1,
        timesteps=20, target_code_size=16, lr=1e-4,
    )
    task = TASKS.get("speech_diffusion_discrete").setup_task(cfg)
    model = task.build_model()
    B, T = 8, 12
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(B, T, 24)).astype(np.float32)
    lengths = rng.integers(6, T + 1, size=B)
    mask = np.arange(T)[None, :] < lengths[:, None]
    variables = task.init_variables(
        model, jax.random.PRNGKey(0),
        {"reduce_target": feat, "reduce_target_lengths": lengths.astype(
            np.int32)})

    def fn(v, f, m):
        return ddim_sample(model, v, f, m, jax.random.PRNGKey(7),
                           start_step=6)

    units_1, recon_1 = jax.jit(fn)(variables, jnp.asarray(feat),
                                   jnp.asarray(mask))

    mesh = make_mesh(data=8, model=1)
    units_8, recon_8 = jax.jit(fn)(
        _replicated(mesh, variables), _put_dp(mesh, feat),
        _put_dp(mesh, mask))
    np.testing.assert_array_equal(np.asarray(units_8), np.asarray(units_1))
    np.testing.assert_allclose(np.asarray(recon_8), np.asarray(recon_1),
                               rtol=1e-4, atol=1e-4)


@needs_devices
@pytest.mark.slow
def test_mask_predict_decode_dp_tp_matches_single():
    """Mask-predict decode under dp=4 x tp=2: batch over "data", the
    decoder/encoder matmuls Megatron-sharded over "model" via the GSPMD
    param rules."""
    from diffnorm_tpu.generate.mask_predict import mask_predict_decode
    from diffnorm_tpu.parallel.sharding_rules import shard_params
    from diffnorm_tpu.registry import TASKS

    cfg = Config(
        arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
        encoder_layers=1, decoder_layers=1, encoder_embed_dim=32,
        encoder_ffn_embed_dim=64, encoder_attention_heads=2,
        decoder_attention_heads=2, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, conv_channels=32,
        depthwise_conv_kernel_size=7, target_code_size=16,
        label_smoothing=0.2, lr=5e-4,
    )
    task = TASKS.get("dummy_nar").setup_task(cfg)
    model = task.build_model()
    batch = task.dummy_batch(8, 32)
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)

    def fn(v, src, lengths):
        toks, scores, steps = mask_predict_decode(
            model, v, src, lengths, max_iter=3, max_len=16)
        return toks, scores

    src = jnp.asarray(batch["src_tokens"])
    lengths = jnp.asarray(batch["src_lengths"])
    toks_1, scores_1 = jax.jit(fn)(variables, src, lengths)

    mesh = make_mesh(data=4, model=2)
    v_sh = dict(variables)
    v_sh["params"] = shard_params(v_sh["params"], mesh, fsdp=False)
    toks_8, scores_8 = jax.jit(fn)(
        v_sh, _put_dp(mesh, src), _put_dp(mesh, lengths))
    np.testing.assert_array_equal(np.asarray(toks_8), np.asarray(toks_1))
    np.testing.assert_allclose(np.asarray(scores_8), np.asarray(scores_1),
                               rtol=1e-4, atol=1e-4)


@needs_devices
@pytest.mark.slow
def test_adaptive_exit_composed_stress(tmp_path):
    """The adaptive-exit while_loop where its paths all compose (VERDICT r4
    item 6): a TRAINED model (so rows actually converge at different
    iterations and the exit fires mid-decode) + length_beam=3 + stacked
    units (n_frames_per_step=2) + tgt_speaker conditioning, decoded under
    dp=4 x tp=2 sharding — pinned equal to early_exit=False and to the
    single-device run. Covers the composition of mask_predict.py:271-347
    (while_loop early exit x beam select x kf unpack x speaker-threaded
    encode) that the individual parity tests exercise only separately.
    Match: iterative_refinement_generator.py:294-361."""
    import yaml

    from diffnorm_tpu.config import make_trainer_config
    from diffnorm_tpu.data.manifest import write_translation_manifest
    from diffnorm_tpu.generate.mask_predict import mask_predict_decode
    from diffnorm_tpu.parallel.sharding_rules import shard_params
    from diffnorm_tpu.registry import TASKS
    from diffnorm_tpu.train.trainer import Trainer

    SPK = 16
    rng = np.random.default_rng(0)
    rows = []
    spk_dir = tmp_path / "spk"
    spk_dir.mkdir()
    spk_lines = ["id\tspeaker_embed"]
    for i in range(4):
        t = int(rng.integers(36, 56))
        np.save(tmp_path / f"utt{i}.npy",
                rng.normal(size=(t, 80)).astype(np.float32))
        units = rng.integers(0, 10, size=2 * (t // 8 + 2))  # even: kf=2
        rows.append({
            "id": f"utt{i}", "src_audio": str(tmp_path / f"utt{i}.npy"),
            "src_n_frames": t, "tgt_audio": " ".join(map(str, units)),
            "tgt_n_frames": len(units),
        })
        np.save(spk_dir / f"utt{i}.spk.npy",
                rng.normal(size=(SPK,)).astype(np.float32))
        spk_lines.append(f"utt{i}\t{spk_dir}/utt{i}.spk.npy")
    write_translation_manifest(str(tmp_path / "train.tsv"), rows)
    (spk_dir / "train.tsv").write_text("\n".join(spk_lines) + "\n")
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(
        {"input_feat_per_channel": 80,
         "target_speaker_embed": str(spk_dir)}))

    cfg = Config(
        data=str(tmp_path), arch="nar_s2ut_conformer",
        criterion="nar_speech_to_unit", label_smoothing=0.1, dropout=0.0,
        encoder_layers=1, decoder_layers=1, encoder_embed_dim=32,
        encoder_ffn_embed_dim=64, encoder_attention_heads=2,
        decoder_attention_heads=2, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, conv_channels=32,
        depthwise_conv_kernel_size=7, target_code_size=10,
        target_speaker_embed=True, speaker_embed_dim=SPK,
        n_frames_per_step=2, lr=5e-3, warmup_updates=20,
    )
    task = TASKS.get("speech_to_speech_fasttranslate").setup_task(cfg)
    ds = task.dataset("train")
    batch = ds.collater([ds[i] for i in range(4)])
    batch = task.prepare_batch(batch, np.random.default_rng(0))
    model = task.build_model()
    crit = task.build_criterion()
    trainer = Trainer(make_trainer_config(cfg), task, model, crit)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    for i in range(120):  # memorize: decode then converges mid-loop
        b = task.prepare_batch(dict(batch), np.random.default_rng(i + 1))
        state, mets = trainer.train_step(state, [b], jax.random.PRNGKey(i))
    assert np.isfinite(float(mets["loss"]))
    variables = {"params": jax.device_get(state.params),
                 **jax.device_get(state.model_state)}  # batch_stats

    src = jnp.asarray(batch["src_tokens"])
    lengths = jnp.asarray(batch["src_lengths"])
    spk = jnp.asarray(batch["tgt_speaker"])
    MAX_ITER = 9

    def fn(v, s, ln, sp, early):
        return mask_predict_decode(
            model, v, s, ln, max_iter=MAX_ITER, max_len=24,
            length_beam=3, n_frames_per_step=2, tgt_speaker=sp,
            early_exit=early)

    toks_w, scores_w, steps_w = jax.jit(
        lambda v, s, ln, sp: fn(v, s, ln, sp, True))(
            variables, src, lengths, spk)
    toks_f, scores_f, steps_f = jax.jit(
        lambda v, s, ln, sp: fn(v, s, ln, sp, False))(
            variables, src, lengths, spk)
    # while_loop early exit == fixed-trip scan, on every composed output
    np.testing.assert_array_equal(np.asarray(toks_w), np.asarray(toks_f))
    np.testing.assert_allclose(np.asarray(scores_w), np.asarray(scores_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(steps_w), np.asarray(steps_f))
    # the trained model must actually converge early somewhere, or this
    # test never exercised the exit
    assert int(np.asarray(steps_w).min()) < MAX_ITER + 1

    mesh = make_mesh(data=4, model=2)
    v_sh = dict(variables)
    v_sh["params"] = shard_params(v_sh["params"], mesh, fsdp=False)
    toks_8, scores_8, steps_8 = jax.jit(
        lambda v, s, ln, sp: fn(v, s, ln, sp, True))(
            v_sh, _put_dp(mesh, src), _put_dp(mesh, lengths),
            _put_dp(mesh, spk))
    np.testing.assert_array_equal(np.asarray(toks_8), np.asarray(toks_w))
    np.testing.assert_array_equal(np.asarray(steps_8), np.asarray(steps_w))
    np.testing.assert_allclose(np.asarray(scores_8), np.asarray(scores_w),
                               rtol=1e-4, atol=1e-4)


@needs_devices
@pytest.mark.slow
def test_s2st_generate_dp_matches_single():
    """The fused speech->units->waveform chain under 8-way dp."""
    from diffnorm_tpu.generate.s2st import s2st_generate
    from diffnorm_tpu.models.hifigan import CodeGenerator
    from diffnorm_tpu.registry import TASKS

    cfg = Config(
        arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
        encoder_layers=1, decoder_layers=1, encoder_embed_dim=32,
        encoder_ffn_embed_dim=64, encoder_attention_heads=2,
        decoder_attention_heads=2, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, conv_channels=32,
        depthwise_conv_kernel_size=7, target_code_size=16,
        label_smoothing=0.2, lr=5e-4,
    )
    task = TASKS.get("dummy_nar").setup_task(cfg)
    model = task.build_model()
    batch = task.dummy_batch(8, 32)
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)

    voc = CodeGenerator(
        num_embeddings=16, embedding_dim=8,
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), dur_predictor=True,
    )
    code0 = jnp.zeros((1, 8), jnp.int32)

    def init_voc(m, c):
        out = m(c)
        m.predict_durations(c)
        return out

    voc_vars = voc.init(jax.random.PRNGKey(1), code0, method=init_voc)

    def fn(nv, vv, src, lengths):
        return s2st_generate(
            model, nv, voc, vv, src, lengths, max_iter=2, max_len=16,
            max_duration=4, vocoder_chunk=0, decode_chunk=0)

    src = jnp.asarray(batch["src_tokens"])
    lengths = jnp.asarray(batch["src_lengths"])
    wav_1, wl_1, units_1, counts_1 = jax.jit(fn)(variables, voc_vars, src,
                                                 lengths)

    mesh = make_mesh(data=8, model=1)
    wav_8, wl_8, units_8, counts_8 = jax.jit(fn)(
        _replicated(mesh, variables), _replicated(mesh, voc_vars),
        _put_dp(mesh, src), _put_dp(mesh, lengths))
    np.testing.assert_array_equal(np.asarray(units_8), np.asarray(units_1))
    np.testing.assert_array_equal(np.asarray(counts_8),
                                  np.asarray(counts_1))
    np.testing.assert_array_equal(np.asarray(wl_8), np.asarray(wl_1))
    np.testing.assert_allclose(np.asarray(wav_8), np.asarray(wav_1),
                               rtol=2e-4, atol=2e-4)
