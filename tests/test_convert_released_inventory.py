"""Released-checkpoint key-inventory fixtures for the converters (VERDICT
r2 item 5).

The converters were parity-tested against verbatim-loaded reference MODULES
with synthetic weights; released fairseq checkpoints additionally carry the
save-path envelope (cfg / optimizer_history / last_optimizer_state /
extra_state — fairseq/checkpoint_utils.py:35-186) and model-key quirks
(pretrain heads like hubert's `label_embs_concat`, `w2v_encoder.` prefixes,
weight-norm pairs, version buffers). These tests harvest the EXACT key sets
the reference constructs by instantiating the verbatim models, wrap them in
the released envelope, and require `cli/convert_checkpoint` to (a) convert
them and (b) pass the element-count inventory audit — failing LOUD when a
checkpoint weight goes unconsumed (injected-foreign-key case).
"""

import json
import types

import pytest

torch = pytest.importorskip("torch")

from diffnorm_tpu.utils import convert_weights as cw  # noqa: E402


def _fairseq_envelope(sd, criterion="label_smoothed_cross_entropy"):
    """The released-checkpoint wrapper fairseq's save path emits
    (trainer.state_dict + checkpoint_utils.torch_persistent_save):
    cfg/args, the model state, optimizer history, extra_state and the
    consolidated optimizer state."""
    flat = list(sd.items())
    last_opt = {
        "state": {
            i: {"step": torch.tensor(100),
                "exp_avg": torch.zeros_like(v.float()),
                "exp_avg_sq": torch.zeros_like(v.float())}
            for i, (_, v) in enumerate(flat) if v.dtype.is_floating_point
        },
        "param_groups": [{"lr": 5e-4, "betas": (0.9, 0.98), "eps": 1e-8,
                          "weight_decay": 0.0, "params": list(
                              range(len(flat)))}],
    }
    return {
        "args": None,
        "cfg": {"model": {"_name": "x"}, "task": {"_name": "y"},
                "criterion": {"_name": criterion}},
        "model": sd,
        "criterion": None,
        "optimizer_history": [{
            "criterion_name": criterion,
            "optimizer_name": "FairseqAdam",
            "lr_scheduler_state": {"best": None},
            "num_updates": 100,
        }],
        "task_state": {},
        "extra_state": {"metrics": {}, "previous_training_time": 1.0,
                        "train_iterator": {"epoch": 3}, "val_loss": 2.5},
        "last_optimizer_state": last_opt,
    }


def _save(tmp_path, name, env):
    path = str(tmp_path / name)
    torch.save(env, path)
    return path


def _convert(tmp_path, out_name, argv):
    from diffnorm_tpu.cli import convert_checkpoint

    out = str(tmp_path / out_name)
    rc = convert_checkpoint.main(argv + ["--output", out])
    assert rc == 0
    from diffnorm_tpu.train.checkpoint import load_checkpoint_params

    return load_checkpoint_params(out)


@pytest.mark.slow
def test_vae_released_checkpoint_inventory(tmp_path):
    from reference_loader import load_latent_module

    lm = load_latent_module()
    torch.manual_seed(0)
    ref = lm.SpeechVAEEncoderDecoder(dim=768, latent_dim=16)
    sd = ref.state_dict()
    path = _save(tmp_path, "vae.pt", _fairseq_envelope(sd))
    variables = _convert(tmp_path, "vae_out", ["--type", "vae",
                                               "--input", path])
    cw.conversion_inventory(sd, variables)  # balanced
    # a released-checkpoint quirk key the converter does not know fails loud
    sd2 = dict(sd)
    sd2["decoder_adapter.weight"] = torch.zeros(7, 9)
    with pytest.raises(ValueError, match="decoder_adapter"):
        cw.conversion_inventory(sd2, variables)


@pytest.mark.slow
def test_diffusion_released_checkpoint_inventory(tmp_path):
    from reference_loader import load_latent_module

    lm = load_latent_module()
    torch.manual_seed(1)
    vae = lm.SpeechVAEEncoderDecoder(dim=768, latent_dim=16)
    holder = types.SimpleNamespace(encoder=vae)
    ldm = lm.LatentDiscreteModel(holder, 64, 16, timesteps=200)
    ldm.model = lm.Model(64, 16, depth=2, wavenet_layers=2,
                         wavenet_stacks=1)
    sd = ldm.state_dict()
    path = _save(tmp_path, "diff.pt", _fairseq_envelope(sd))
    variables = _convert(tmp_path, "diff_out", ["--type", "diffusion",
                                                "--input", path])
    cw.conversion_inventory(sd, variables)


@pytest.mark.slow
def test_nar_released_checkpoint_inventory(tmp_path):
    """The full verbatim nar_s2ut_conformer state dict (REAL conformer
    encoder + REAL TransformerUnitDecoder incl. decoder.version and
    sinusoidal `_float_tensor` buffers + the shared output projection)."""
    from test_train_trajectory_parity import _nar_args
    from reference_loader import load_dictionary, load_nar_full_model

    m = load_nar_full_model()
    dmod = load_dictionary()
    d = dmod.Dictionary()
    for u in range(10):
        d.add_symbol(str(u))
    task_ns = types.SimpleNamespace(
        args=types.SimpleNamespace(target_is_code=True),
        target_dictionary=d, multitask_tasks={},
    )
    torch.manual_seed(2)
    ref = m.NARS2UTConformerModel.build_model(_nar_args(), task_ns)
    sd = ref.state_dict()
    assert "decoder.version" in sd  # the released-layout buffers are there
    assert "decoder.embed_positions._float_tensor" in sd
    path = _save(tmp_path, "nar.pt", _fairseq_envelope(sd))
    variables = _convert(tmp_path, "nar_out", ["--type", "nar",
                                               "--input", path])
    cw.conversion_inventory(sd, variables)


@pytest.mark.slow
def test_hubert_inventory(tmp_path):
    """REAL HubertModel state dict: carries `label_embs_concat`,
    `final_proj` and `mask_emb` — pretrain-only keys the inference encoder
    converter documents as expected_unconsumed — plus the CTC fine-tune's
    `w2v_encoder.` prefix variant."""
    from reference_loader import load_hubert

    hub = load_hubert()
    # real class at reduced depth (identical key layout to the mHuBERT
    # release modulo the layer count)
    cfg = hub.HubertConfig()
    cfg.encoder_layers = 2
    cfg.label_rate = 50
    task_cfg = types.SimpleNamespace(sample_rate=16000, normalize=False,
                                     data="")
    torch.manual_seed(3)
    model = hub.HubertModel(cfg, task_cfg, [list("abcdefgh")])
    sd = model.state_dict()
    assert "label_embs_concat" in sd and "mask_emb" in sd
    path = _save(tmp_path, "hubert.pt", _fairseq_envelope(sd))
    variables = _convert(
        tmp_path, "hubert_out",
        ["--type", "hubert", "--input", path, "--hubert-layers", "2"])
    cw.conversion_inventory(
        sd, variables, expected_unconsumed=cw.EXPECTED_UNCONSUMED["hubert"])
    # CTC fine-tune layout: the same backbone under w2v_encoder.w2v_model.
    # + the CTC projection (hubert_asr.py HubertCtc)
    sd_ctc = {f"w2v_encoder.w2v_model.{k}": v for k, v in sd.items()}
    sd_ctc["w2v_encoder.proj.weight"] = torch.zeros(12, 768)
    sd_ctc["w2v_encoder.proj.bias"] = torch.zeros(12)
    path2 = _save(tmp_path, "hubert_ctc.pt", _fairseq_envelope(sd_ctc))
    variables2 = _convert(
        tmp_path, "hubert_ctc_out",
        ["--type", "hubert_ctc", "--input", path2, "--hubert-layers", "2"])
    cw.conversion_inventory(
        sd_ctc, variables2,
        expected_unconsumed=cw.EXPECTED_UNCONSUMED["hubert_ctc"])


@pytest.mark.slow
def test_hifigan_released_checkpoint_inventory(tmp_path):
    """REAL vendored HiFi-GAN CodeGenerator (research/TranSpeech/hifigan):
    weight-normed convs (weight_g/weight_v pairs) under the released
    {'generator': sd} layout."""
    from reference_loader import load_code_hifigan

    ref_mod = load_code_hifigan()
    vcfg = {
        "num_embeddings": 16, "embedding_dim": 8, "model_in_dim": 8,
        "upsample_rates": [4, 2], "upsample_kernel_sizes": [8, 4],
        "upsample_initial_channel": 16, "resblock_kernel_sizes": [3, 5],
        "resblock_dilation_sizes": [[1, 3, 5], [1, 2, 3]],
        "dur_predictor_params": {
            "encoder_embed_dim": 8, "var_pred_hidden_dim": 8,
            "var_pred_kernel_size": 3, "var_pred_dropout": 0.0,
        },
    }
    torch.manual_seed(4)
    gen = ref_mod.CodeGenerator(vcfg)
    sd = gen.state_dict()
    assert any(k.endswith("weight_g") for k in sd)  # weight-norm pairs
    cfg_path = tmp_path / "voc_cfg.json"
    cfg_path.write_text(json.dumps(vcfg))
    path = _save(tmp_path, "g_00500000", {"generator": sd})
    variables = _convert(
        tmp_path, "hifigan_out",
        ["--type", "hifigan", "--input", path,
         "--vocoder-cfg", str(cfg_path)])
    cw.conversion_inventory(sd, variables)
