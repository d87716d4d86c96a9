"""Integrated training-trajectory parity vs the verbatim reference stack.

Every component is pinned individually elsewhere (models, criterions,
optimizers, schedulers); these tests pin the COMPOSED training loop: for
each trained stage, identical tiny data + identical converted init drive
N optimizer updates with grad-accum (update_freq 2) through

  * the verbatim-loaded reference model + the reference criterion's loss
    assembly + the REAL fairseq Adam (fairseq/optim/adam.py) + the REAL
    InverseSquareRootSchedule + fairseq's trainer orchestration
    (trainer.py:784-1000: per-micro backward, multiply_grads by
    1/sum(sample_size) (:932), clip_grad_norm 2.0 (:939), step), vs
  * our actual train/trainer.py Trainer.

Per-step loss curves, grad norms and the final parameters must agree —
this is the only test that would catch a clip-order / accum-weighting /
lr-application drift that every per-component test misses.

Stochastic draws (posterior eps, diffusion times/noises) are shared by
injection: monkeypatched torch.randn on the reference side, the criterion
injection keys on ours. Dropout is zeroed on both sides (its rng streams
are framework-specific by construction).
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_loader import (  # noqa: E402
    install_fairseq_stubs,
    load_fairseq_adam,
    load_inverse_sqrt_scheduler,
    load_latent_module,
)

from diffnorm_tpu.config import Config, make_trainer_config  # noqa: E402
from diffnorm_tpu.registry import TASKS  # noqa: E402
from diffnorm_tpu.train.trainer import Trainer  # noqa: E402

B, T, DIM, LATENT = 2, 9, 768, 16
N_UPDATES = 12
UPDATE_FREQ = 2
CLIP = 2.0
LR, WARMUP, WARMUP_INIT = 5e-4, 4, 1e-7
BETAS, EPS = (0.9, 0.98), 1e-8


def _zero_dropout(model):
    """Disable every dropout in a torch module tree (nn.Dropout p and the
    float `dropout` attr the reference Attend/Attention modules feed to
    F.scaled_dot_product_attention)."""
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        if hasattr(m, "dropout") and isinstance(m.dropout, float):
            m.dropout = 0.0


class _FairseqLoop:
    """fairseq/trainer.py:784-1000 single-process orchestration with the
    REAL fairseq Adam and InverseSquareRootSchedule."""

    def __init__(self, params):
        install_fairseq_stubs()
        adam_mod = load_fairseq_adam()
        sched_mod = load_inverse_sqrt_scheduler()
        self.params = [p for p in params if p.requires_grad]
        self.opt = adam_mod.Adam(
            self.params, lr=WARMUP_INIT, betas=BETAS, eps=EPS,
            weight_decay=0.0)
        outer = self

        class _OptProxy:
            def set_lr(self, v):
                for g in outer.opt.param_groups:
                    g["lr"] = v

            def get_lr(self):
                return outer.opt.param_groups[0]["lr"]

        cfg = types.SimpleNamespace(
            lr=[LR], warmup_updates=WARMUP, warmup_init_lr=WARMUP_INIT)
        self.sched = sched_mod.InverseSquareRootSchedule(cfg, _OptProxy())
        self.update = 0

    def step(self, micro_losses_ss):
        """One optimizer update. micro_losses_ss: list of (loss, ss) where
        loss is the value the reference criterion returns (backwarded
        verbatim, trainer.py:832) and ss its sample_size. Returns
        (per-micro loss values, per-micro sample sizes, grad norm)."""
        self.opt.zero_grad()
        losses, sss = [], []
        for loss, ss in micro_losses_ss:
            loss.backward()
            losses.append(float(loss.detach()))
            sss.append(float(ss))
        ss_total = sum(sss)
        for p in self.params:
            if p.grad is not None:
                p.grad.data.mul_(1.0 / ss_total)  # multiply_grads (:932)
        gnorm = float(torch.nn.utils.clip_grad_norm_(self.params, CLIP))
        self.sched.step_update(self.update)  # lr for update k (pinned conv.)
        self.opt.step()
        self.update += 1
        return losses, sss, gnorm


def _vae_batches(rng):
    """UPDATE_FREQ*N_UPDATES microbatches (4 distinct, cycled) with varied
    valid lengths and the 0-padded unit convention."""
    base = []
    for _ in range(4):
        lengths = np.sort(rng.integers(T // 2, T + 1, size=B))[::-1].copy()
        feat = rng.normal(size=(B, T, DIM)).astype(np.float32)
        units = rng.integers(4, 1004, size=(B, T)).astype(np.int32)
        mask = np.arange(T)[None, :] < lengths[:, None]
        units[~mask] = 0
        feat[~mask] = 0.0
        base.append({
            "reduce_target": feat,
            "reduce_target_unit": units,
            "reduce_target_lengths": lengths.astype(np.int32),
        })
    out = []
    for k in range(UPDATE_FREQ * N_UPDATES):
        b = dict(base[k % 4])
        b["posterior_noise"] = rng.normal(
            size=(B, T, LATENT)).astype(np.float32)
        out.append(b)
    return out


@pytest.mark.slow
def test_vae_train_trajectory_matches_reference():
    lm = load_latent_module()
    torch.manual_seed(0)
    ref = lm.SpeechVAEEncoderDecoder(dim=DIM, latent_dim=LATENT)
    ref.train()
    _zero_dropout(ref)
    sd = {k: v.detach() for k, v in ref.state_dict().items()}

    from diffnorm_tpu.criterions.vae_loss import SpeechVAELoss
    from diffnorm_tpu.utils.convert_weights import convert_vae_state

    class _DetVAELoss(SpeechVAELoss):
        """train=False disables dropout on our side (zeroed on the torch
        side); grads/accum/clip/lr composition is unchanged."""

        def __call__(self, model, variables, batch, rng, train=True):
            return super().__call__(model, variables, batch, rng,
                                    train=False)

    cfg = Config(
        arch="speech_vae_decoder", criterion="speech_vae_decoder_loss",
        feature_dim=DIM, latent_dim=LATENT, target_code_size=1000,
        lr=LR, lr_scheduler="inverse_sqrt", warmup_updates=WARMUP,
        warmup_init_lr=WARMUP_INIT, adam_betas=BETAS, adam_eps=EPS,
        clip_norm=CLIP, update_freq=UPDATE_FREQ,
    )
    task = TASKS.get("dummy_vae").setup_task(cfg)
    model = task.build_model()
    trainer = Trainer(make_trainer_config(cfg), task, model,
                      _DetVAELoss(cfg, task))

    rng = np.random.default_rng(0)
    micros = _vae_batches(rng)

    state = trainer.init_state(jax.random.PRNGKey(0), micros[0])
    conv = convert_vae_state(sd)
    # same tree structure => the fresh (zero) adam moments stay valid
    assert (jax.tree_util.tree_structure(state.params)
            == jax.tree_util.tree_structure(conv))
    state = state.replace(params=jax.tree_util.tree_map(
        lambda c, p: jnp.asarray(c, p.dtype), conv, state.params))

    # ---- reference side ----
    install_fairseq_stubs()
    import sys

    ls_nll = sys.modules[
        "fairseq.criterions.label_smoothed_cross_entropy"
    ].label_smoothed_nll_loss
    loop = _FairseqLoop(ref.parameters())
    real_randn = torch.randn

    def ref_micro(batch):
        feat = torch.from_numpy(batch["reduce_target"])
        units = torch.from_numpy(batch["reduce_target_unit"]).long()
        lengths = batch["reduce_target_lengths"]
        mask = torch.from_numpy(
            np.arange(T)[None, :] < lengths[:, None])
        eps = batch["posterior_noise"].transpose(0, 2, 1)  # [B, C, T]
        try:
            torch.randn = lambda *s, **k: torch.from_numpy(eps)
            mse, lm_pred, kl = ref(feat, units, mask)
        finally:
            torch.randn = real_randn
        # criterion assembly, speech_vae_decoder_loss.py:61-87
        lprobs = torch.log_softmax(lm_pred.float(), dim=-1)
        lprobs = lprobs.view(-1, lprobs.size(-1))
        ce, _ = ls_nll(lprobs, units.view(-1), 0.1, ignore_index=0,
                       reduce=True)
        ntokens = int(lengths.sum())
        loss = 0.1 * (ce / ntokens) + 10 * mse + 1e-4 * kl
        return loss, B  # sample_size = nsentences

    ref_losses, ref_gnorms, our_losses, our_gnorms = [], [], [], []
    for u in range(N_UPDATES):
        chunk = micros[u * UPDATE_FREQ:(u + 1) * UPDATE_FREQ]
        losses, sss, gnorm_r = loop.step([ref_micro(m) for m in chunk])
        # our logged loss = sum(l_i * ss_i) / sum(ss_i) (mean criterion)
        ref_losses.append(sum(l * s for l, s in zip(losses, sss)) / sum(sss))
        ref_gnorms.append(gnorm_r)
        state, mets = trainer.train_step(state, chunk, jax.random.PRNGKey(u))
        our_losses.append(mets["loss"])
        our_gnorms.append(mets["gnorm"])

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(our_gnorms, ref_gnorms, rtol=5e-3, atol=1e-4)

    # final parameters agree (the strictest composed check: any clip-order /
    # accum-weighting / lr drift compounds here)
    sd_after = {k: v.detach() for k, v in ref.state_dict().items()}
    conv_after = convert_vae_state(sd_after)
    ours_after = jax.device_get(state.params)
    flat_ref = jax.tree_util.tree_leaves(conv_after)
    flat_ours = jax.tree_util.tree_leaves(ours_after)
    for a, b in zip(flat_ours, flat_ref):
        # atol 5e-4: torch-vs-XLA fp32 reduction orders drift a few 1e-4
        # on near-zero weights over 12 adam steps (loss/gnorm curves above
        # pin the composition to 2e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


HID = 64  # denoiser width (small instance of the SAME reference class)


@pytest.mark.slow
def test_diffusion_train_trajectory_matches_reference():
    """Diffusion stage: frozen-VAE composition + ddpm_discrete_loss
    (reference latent_module.py:1514-1613 forward, ddpm_discrete_loss.py
    criterion, diff_discrete.py:73-79 VAE freeze)."""
    lm = load_latent_module()
    torch.manual_seed(3)
    ref_vae = lm.SpeechVAEEncoderDecoder(dim=DIM, latent_dim=LATENT)
    holder = types.SimpleNamespace(encoder=ref_vae)
    ldm = lm.LatentDiscreteModel(holder, HID, LATENT, timesteps=200)
    ldm.model = lm.Model(HID, LATENT, depth=2, wavenet_layers=2,
                         wavenet_stacks=1)
    ldm.train()
    _zero_dropout(ldm)
    for p in ldm.speech_decoder.parameters():  # frozen prior stage
        p.requires_grad = False
    sd = {k: v.detach() for k, v in ldm.state_dict().items()}

    from diffnorm_tpu.criterions.ddpm_loss import DDPMDiscreteLoss
    from diffnorm_tpu.utils.convert_weights import convert_diffusion_state

    class _DetDiffLoss(DDPMDiscreteLoss):
        def __call__(self, model, variables, batch, rng, train=True):
            return super().__call__(model, variables, batch, rng,
                                    train=False)

    cfg = Config(
        arch="diff_discrete", criterion="ddpm_discrete_loss",
        hidden_dim=HID, latent_dim=LATENT, feature_dim=DIM, timesteps=200,
        denoiser_depth=2, wavenet_layers=2, wavenet_stacks=1,
        target_code_size=1000,
        lr=LR, lr_scheduler="inverse_sqrt", warmup_updates=WARMUP,
        warmup_init_lr=WARMUP_INIT, adam_betas=BETAS, adam_eps=EPS,
        clip_norm=CLIP, update_freq=UPDATE_FREQ,
    )
    task = TASKS.get("speech_diffusion_discrete").setup_task(cfg)
    model = task.build_model()
    trainer = Trainer(make_trainer_config(cfg), task, model,
                      _DetDiffLoss(cfg, task))

    rng = np.random.default_rng(7)
    micros = _vae_batches(rng)
    for k, b in enumerate(micros):
        b.pop("posterior_noise")
        r = np.random.default_rng(1000 + k)
        b["inject_times"] = r.integers(1, 200, size=(B,)).astype(np.int32)
        # reference draw order: posterior [B, C, T], beta_0 jitter and
        # q-sample noise [B, T, C] (pinned in test_reference_parity.py:250)
        b["_eps_post"] = r.normal(size=(B, LATENT, T)).astype(np.float32)
        b["inject_x1_noise"] = r.normal(size=(B, T, LATENT)).astype(
            np.float32)
        b["inject_q_noise"] = r.normal(size=(B, T, LATENT)).astype(
            np.float32)
        b["inject_enc_noise"] = b["_eps_post"].transpose(0, 2, 1)

    state = trainer.init_state(jax.random.PRNGKey(0), micros[0])
    conv = dict(convert_diffusion_state(sd))
    conv_vae = {"vae": conv.pop("vae")}
    assert (jax.tree_util.tree_structure(state.params)
            == jax.tree_util.tree_structure(conv))
    state = state.replace(
        params=jax.tree_util.tree_map(
            lambda c, p: jnp.asarray(c, p.dtype), conv, state.params),
        frozen_params=jax.tree_util.tree_map(
            jnp.asarray, conv_vae),
    )

    loop = _FairseqLoop(ldm.parameters())
    real_randn, real_randn_like = torch.randn, torch.randn_like
    real_randint = torch.randint

    def ref_micro(batch):
        feat = torch.from_numpy(batch["reduce_target"])
        units = torch.from_numpy(batch["reduce_target_unit"]).long()
        lengths = batch["reduce_target_lengths"]
        mask = torch.from_numpy(np.arange(T)[None, :] < lengths[:, None])
        queue = [batch["_eps_post"], batch["inject_x1_noise"],
                 batch["inject_q_noise"]]

        def fake_randn(*shape, **kw):
            return torch.from_numpy(queue.pop(0))

        try:
            torch.randn = fake_randn
            torch.randn_like = lambda x: fake_randn()
            torch.randint = lambda *a, **k: torch.from_numpy(
                batch["inject_times"].astype(np.int64))
            loss_dict = ldm(feat, units, tgt_mask=mask)
        finally:
            torch.randn, torch.randn_like = real_randn, real_randn_like
            torch.randint = real_randint
        return loss_dict["total_loss"], B  # sample_size = nsentences

    ref_losses, our_losses, ref_gnorms, our_gnorms = [], [], [], []
    for u in range(N_UPDATES):
        chunk = micros[u * UPDATE_FREQ:(u + 1) * UPDATE_FREQ]
        losses, sss, gnorm_r = loop.step([ref_micro(m) for m in chunk])
        ref_losses.append(sum(l * s for l, s in zip(losses, sss)) / sum(sss))
        ref_gnorms.append(gnorm_r)
        state, mets = trainer.train_step(state, chunk, jax.random.PRNGKey(u))
        our_losses.append(mets["loss"])
        our_gnorms.append(mets["gnorm"])

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(our_gnorms, ref_gnorms, rtol=5e-3, atol=1e-4)

    sd_after = {k: v.detach() for k, v in ldm.state_dict().items()}
    conv_after = dict(convert_diffusion_state(sd_after))
    conv_after.pop("vae")
    flat_ref = jax.tree_util.tree_leaves(conv_after)
    flat_ours = jax.tree_util.tree_leaves(jax.device_get(state.params))
    for a, b in zip(flat_ours, flat_ref):
        # atol 5e-4: the denoiser sees the 768-dim VAE encode, whose
        # torch-vs-XLA fp32 reduction orders drift a few 1e-4 over 12
        # adam updates (losses and gnorms above track to 2e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)
    # the frozen VAE never moved
    sd_vae_after = convert_diffusion_state(sd_after)["vae"]
    for a, b in zip(jax.tree_util.tree_leaves(conv_vae["vae"]),
                    jax.tree_util.tree_leaves(sd_vae_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


NDIM, NFFN, NHEADS, NLAYERS, NK, NVOCAB = 32, 64, 2, 2, 7, 14
EPS_LS = 0.2


def _nar_args():
    return types.SimpleNamespace(
        encoder_freezing_updates=0, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, activation_fn="relu",
        encoder_embed_dim=NDIM, encoder_ffn_embed_dim=NFFN,
        encoder_layers=NLAYERS, encoder_attention_heads=NHEADS,
        encoder_normalize_before=True, no_scale_embedding=False,
        conv_version="s2t_transformer", conv_kernel_sizes="5,5",
        conv_channels=NDIM, input_feat_per_channel=80, input_channels=1,
        max_source_positions=200, max_target_positions=128,
        pos_enc_type="rel_pos", depthwise_conv_kernel_size=NK,
        attn_type="espnet", fp16=False,
        decoder_embed_dim=NDIM, decoder_ffn_embed_dim=NFFN,
        decoder_layers=NLAYERS, decoder_attention_heads=NHEADS,
        decoder_normalize_before=True, decoder_learned_pos=False,
        share_decoder_input_output_embed=True, decoder_layerdrop=0.0,
        decoder_output_dim=NDIM, decoder_input_dim=NDIM,
        adaptive_softmax_cutoff=None, adaptive_input=False,
        no_token_positional_embeddings=False, quant_noise_pq=0,
        length_loss_factor=0.1, n_frames_per_step=1, cg_prob=0.0,
        use_sp=False, sg_length_pred=False, pred_length_offset=False,
        src_embedding_copy=False, target_speaker_embed=False,
        speaker_embed_dim=None, load_pretrained_encoder_from=None,
    )


def _nar_batches(rng):
    """Distinct microbatches: fbank src + unit targets + the CMLM canvas
    drawn host-side with our task's pinned random_mask (shared verbatim
    with the reference side)."""
    from diffnorm_tpu.tasks.nar_s2ut_task import random_mask

    out = []
    for k in range(UPDATE_FREQ * N_UPDATES):
        r = np.random.default_rng(500 + k % 4)
        src = r.normal(size=(B, 40, 80)).astype(np.float32)
        lengths = np.array([40, 29], np.int32)
        src[1, 29:] = 0.0
        tgt = r.integers(4, NVOCAB, size=(B, 8)).astype(np.int32)
        tgt[:, -1] = 2
        tgt[1, 5:] = 1
        tgt[1, 5] = 2
        prev = random_mask(tgt, np.random.default_rng(900 + k))
        out.append({
            "src_tokens": src, "src_lengths": lengths,
            "target": tgt, "prev_target": prev,
        })
    return out


@pytest.mark.slow
def test_nar_train_trajectory_matches_reference():
    """NAR S2UT stage: the verbatim nar_s2ut_conformer model
    (research/TranSpeech/nar_conformer.py on the REAL S2TConformerEncoder +
    REAL TransformerDecoder) + the nar_speech_to_unit criterion assembly
    (nar_speech_to_unit.py:165-196: masked unit CE + length CE, sum losses,
    sample_size=ntokens) — train-mode batch-norm on both sides."""
    from reference_loader import load_dictionary, load_nar_full_model

    m = load_nar_full_model()
    dmod = load_dictionary()
    d = dmod.Dictionary()
    for u in range(NVOCAB - 4):
        d.add_symbol(str(u))
    args = _nar_args()
    task_ns = types.SimpleNamespace(
        args=types.SimpleNamespace(target_is_code=True),
        target_dictionary=d, multitask_tasks={},
    )
    torch.manual_seed(5)
    ref = m.NARS2UTConformerModel.build_model(args, task_ns)
    ref.train()
    _zero_dropout(ref)
    sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}

    from diffnorm_tpu.utils.convert_weights import convert_nar_state

    cfg = Config(
        arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
        encoder_layers=NLAYERS, decoder_layers=NLAYERS,
        encoder_embed_dim=NDIM, encoder_ffn_embed_dim=NFFN,
        encoder_attention_heads=NHEADS, decoder_attention_heads=NHEADS,
        decoder_embed_dim=NDIM, decoder_ffn_embed_dim=NFFN,
        conv_channels=NDIM, depthwise_conv_kernel_size=NK,
        target_code_size=NVOCAB - 4, label_smoothing=EPS_LS,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        lr=LR, lr_scheduler="inverse_sqrt", warmup_updates=WARMUP,
        warmup_init_lr=WARMUP_INIT, adam_betas=BETAS, adam_eps=EPS,
        clip_norm=CLIP, update_freq=UPDATE_FREQ,
    )
    task = TASKS.get("dummy_nar").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    trainer = Trainer(make_trainer_config(cfg), task, model, crit)

    micros = _nar_batches(np.random.default_rng(0))
    state = trainer.init_state(jax.random.PRNGKey(0), micros[0])
    conv = convert_nar_state(sd)["params"]
    assert (jax.tree_util.tree_structure(state.params)
            == jax.tree_util.tree_structure(conv))
    state = state.replace(params=jax.tree_util.tree_map(
        lambda c, p: jnp.asarray(c, p.dtype), conv, state.params))

    install_fairseq_stubs()
    import sys

    ls_nll = sys.modules[
        "fairseq.criterions.label_smoothed_cross_entropy"
    ].label_smoothed_nll_loss
    loop = _FairseqLoop(ref.parameters())

    def ref_micro(batch):
        src = torch.from_numpy(batch["src_tokens"])
        lengths = torch.from_numpy(batch["src_lengths"]).long()
        tgt = torch.from_numpy(batch["target"]).long()
        prev = torch.from_numpy(batch["prev_target"]).long()
        logits, extra = ref(src, lengths, prev, tgt_tokens=tgt,
                            return_all_hiddens=True)
        # criterion assembly, nar_speech_to_unit.py:165-196
        masks = extra["word_ins_mask"]
        lp = torch.log_softmax(logits[masks].float(), dim=-1)
        loss, _ = ls_nll(lp, tgt[masks].view(-1), EPS_LS,
                         ignore_index=d.pad(), reduce=True)
        lp_len = torch.log_softmax(extra["length_out"].float(), dim=-1)
        loss_len, _ = ls_nll(lp_len, extra["length_tgt"].view(-1), EPS_LS,
                             ignore_index=d.pad(), reduce=True)
        loss = loss + loss_len
        ntokens = int((tgt != d.pad()).sum())
        return loss, ntokens  # sample_size = ntokens (sentence_avg off)

    ref_losses, our_losses, ref_gnorms, our_gnorms = [], [], [], []
    for u in range(N_UPDATES):
        chunk = micros[u * UPDATE_FREQ:(u + 1) * UPDATE_FREQ]
        losses, sss, gnorm_r = loop.step([ref_micro(mb) for mb in chunk])
        # sum-loss criterion: the per-token mean over the update is
        # sum(sum_i) / sum(ntokens_i) — what our trainer logs as "loss"
        # (our criterion returns sum/ntokens, weighted by ss=ntokens)
        ref_losses.append(sum(losses) / sum(sss))
        ref_gnorms.append(gnorm_r)
        state, mets = trainer.train_step(state, chunk, jax.random.PRNGKey(u))
        our_losses.append(mets["loss"])
        our_gnorms.append(mets["gnorm"])

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(our_gnorms, ref_gnorms, rtol=5e-3, atol=1e-4)

    sd_after = {k: v.detach() for k, v in ref.state_dict().items()}
    conv_after = convert_nar_state(sd_after)["params"]
    flat_ref = jax.tree_util.tree_leaves(conv_after)
    flat_ours = jax.tree_util.tree_leaves(jax.device_get(state.params))
    for a, b in zip(flat_ours, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)
