"""cli/s2st.py — the fused one-process S2ST chain (VERDICT r2 item 3).

Gates the fused CLI against the separate generate -> generate_waveform
pipeline on the same checkpoint + data: the reduced unit streams must agree
line-for-line and the synthesized waveforms must agree away from the
padded-tail receptive-field boundary.
"""

import json
import os
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from diffnorm_tpu.config import Config
from diffnorm_tpu.data.manifest import write_translation_manifest
from diffnorm_tpu.registry import TASKS

NAR_CFG = dict(
    task="speech_to_speech_fasttranslate",
    arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
    encoder_layers=1, decoder_layers=1, encoder_embed_dim=32,
    encoder_ffn_embed_dim=64, encoder_attention_heads=2,
    decoder_attention_heads=2, decoder_embed_dim=32,
    decoder_ffn_embed_dim=64, conv_channels=32,
    depthwise_conv_kernel_size=7, target_code_size=16,
    label_smoothing=0.2, lr=5e-4, max_target_positions=16,
    iter_decode_max_iter=3,
)


@pytest.fixture(scope="module")
def s2st_setup(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("s2stcli")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        t = int(rng.integers(36, 56))
        feat = rng.normal(size=(t, 80)).astype(np.float32)
        np.save(tmp_path / f"utt{i}.npy", feat)
        units = rng.integers(0, 16, size=t // 6 + 2)
        rows.append({
            "id": f"utt{i}", "src_audio": str(tmp_path / f"utt{i}.npy"),
            "src_n_frames": t, "tgt_audio": " ".join(map(str, units)),
            "tgt_n_frames": len(units),
        })
    write_translation_manifest(str(tmp_path / "test.tsv"), rows)
    (tmp_path / "config.yaml").write_text(yaml.safe_dump({
        "input_feat_per_channel": 80,
    }))

    # random-init NAR checkpoint (full variables incl. batch_stats)
    cfg = Config(data=str(tmp_path), **NAR_CFG)
    task = TASKS.get("speech_to_speech_fasttranslate").setup_task(cfg)
    task.load_dataset("test")
    ds = task.dataset("test")
    batch0 = ds.collater([ds[0]])
    batch0.setdefault("prev_target", batch0["target"])
    model = task.build_model()
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch0)

    # a random init collapses every mask-predict fill onto one dominant
    # logit column (often a special) — zero the specials' output columns
    # and amplify the unit columns so the decode emits a varied unit stream
    def _bias_units(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        if names[-2:] == ["output_proj", "kernel"]:
            leaf = np.array(leaf)
            leaf[:, :4] = 0.0
            leaf[:, 4:] *= 10.0
            return jnp.asarray(leaf)
        if names[-2:] == ["embed_tokens", "embedding"]:
            # shared in/out embedding (logits = x @ embed.T): suppress the
            # special rows, amplify the unit rows
            leaf = np.array(leaf)
            leaf[:4] = 0.0
            leaf[4:] *= 10.0
            return jnp.asarray(leaf)
        return leaf

    import jax.tree_util as jtu

    variables = dict(variables)
    variables["params"] = jtu.tree_map_with_path(
        _bias_units, jax.device_get(variables["params"]))
    import orbax.checkpoint as ocp

    ckpt = str(tmp_path / "nar_ck")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt, jax.device_get(variables))
    ckptr.wait_until_finished()

    # vocoder config + converted-style checkpoint
    vcfg = dict(num_embeddings=16, embedding_dim=8, upsample_rates=[4, 2],
                upsample_kernel_sizes=[8, 4], upsample_initial_channel=16,
                resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 2]])
    (tmp_path / "voc_cfg.json").write_text(json.dumps(vcfg))
    from diffnorm_tpu.models.hifigan import CodeHiFiGANVocoder

    voc = CodeHiFiGANVocoder.from_config(vcfg, rng=jax.random.PRNGKey(1))
    voc_ckpt = str(tmp_path / "voc_ck")
    ckptr.save(voc_ckpt, jax.device_get(voc.variables))
    ckptr.wait_until_finished()
    return tmp_path, ckpt, voc_ckpt


def _read_wav(path):
    with wave.open(path) as w:
        pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    return pcm.astype(np.float32) / 32767.0


@pytest.mark.slow
def test_s2st_cli_matches_separate_pipeline(s2st_setup):
    tmp_path, ckpt, voc_ckpt = s2st_setup
    from diffnorm_tpu.cli import generate, generate_waveform, s2st

    # ---- fused one-process chain ----
    fused_dir = str(tmp_path / "fused")
    rc = s2st.main(Config(
        data=str(tmp_path), path=ckpt, cpu=True, gen_subset="test",
        vocoder=voc_ckpt, vocoder_cfg=str(tmp_path / "voc_cfg.json"),
        results_path=fused_dir, batch_size=4, **NAR_CFG))
    assert rc == 0
    unit_file = os.path.join(fused_dir, "s2st-test.unit")
    fused_units = {}
    with open(unit_file) as f:
        for line in f:
            uid, units = line.strip().split("|")
            fused_units[uid] = [int(u) for u in units.split()] if units \
                else []
    wavs = sorted(f for f in os.listdir(fused_dir) if f.endswith("_pred.wav"))
    assert len(wavs) == 4 and len(fused_units) == 4

    # ---- separate three-stage pipeline on the same checkpoint ----
    gen_dir = str(tmp_path / "gen")
    rc = generate.main(Config(
        data=str(tmp_path), path=ckpt, cpu=True, gen_subset="test",
        results_path=gen_dir, batch_size=4, **NAR_CFG))
    assert rc == 0
    def to_code(x):
        try:
            return int(x)
        except ValueError:
            return -1  # <unk> etc. — stripped like the reference vocoder
            # wrapper (generate_waveform.parse_code_line)

    hyp = {}
    with open(os.path.join(gen_dir, "generate-test.txt")) as f:
        for line in f:
            if line.startswith("H-"):
                key, _score, units = line.rstrip("\n").split("\t")
                # generate keys H- lines by dataset index; the fused CLI
                # now writes true manifest utt ids (utt{i})
                hyp[f"utt{int(key[2:])}"] = [to_code(u)
                                             for u in units.split()] \
                    if units else []
    assert len(hyp) == 4

    # unit parity: fused REDUCED stream == dedup of the valid (non-special)
    # generate H- stream — the fused chain strips specials before reducing
    any_units = False
    for uid, units in hyp.items():
        valid = [u for u in units if u >= 0]
        reduced = [u for i, u in enumerate(valid)
                   if i == 0 or u != valid[i - 1]]
        assert fused_units[uid] == reduced, uid
        any_units = any_units or bool(reduced)
    assert any_units  # random init must decode SOME units or the test is
    # vacuous (reseed the fixture if this ever trips)

    # waveform parity: synthesize the generate units (un-reduced, matching
    # the fused dur_prediction=False path) through the standalone vocoder
    # CLI and compare sample-for-sample away from the padded-tail boundary
    code_file = str(tmp_path / "hyp.unit")
    with open(code_file, "w") as f:
        for uid in sorted(hyp):
            f.write(f"{uid}|" + " ".join(map(str, hyp[uid])) + "\n")
    wav_dir = str(tmp_path / "sep_wavs")
    generate_waveform.main([
        "--in-code-file", code_file, "--vocoder", voc_ckpt,
        "--vocoder-cfg", str(tmp_path / "voc_cfg.json"),
        "--results-path", wav_dir, "--cpu"])
    upsample = 4 * 2
    guard = 6 * upsample  # transposed-conv receptive-field bleed from the
    # fused chain's padded unit tail (tiny vocoder: kernels 8/4, res k=3)
    for i, uid in enumerate(sorted(hyp)):
        fused = _read_wav(os.path.join(fused_dir, f"{uid}_pred.wav"))
        sep = _read_wav(os.path.join(wav_dir, f"{i}_pred.wav"))
        n = min(len(fused), len(sep)) - guard
        assert n > 0, (uid, len(fused), len(sep))
        np.testing.assert_allclose(fused[:n], sep[:n], atol=2e-3,
                                   err_msg=uid)
