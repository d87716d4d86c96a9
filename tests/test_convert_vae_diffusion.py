"""Checkpoint-conversion parity for the DiffNorm VAE and latent-diffusion
denoiser: a from-scratch torch implementation of the reference modules
(fairseq/models/text_to_speech/latent_module.py — attribute names chosen to
reproduce the fairseq state-dict key layout) is randomly initialized, its
state dict run through utils/convert_weights.convert_{vae,denoiser,
diffusion}_state, and forward outputs compared against our flax modules."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffnorm_tpu.models.diffusion import Denoiser  # noqa: E402
from diffnorm_tpu.models.vae import SpeechVAEModule  # noqa: E402
from diffnorm_tpu.utils.convert_weights import (  # noqa: E402
    convert_denoiser_state,
    convert_diffusion_state,
    convert_vae_state,
)

# ---------------------------------------------------------------------------
# torch reference implementation (latent_module.py math, same attr names)
# ---------------------------------------------------------------------------


class TCausalConv1d(tnn.Conv1d):
    def __init__(self, cin, cout, k, dilation=1):
        super().__init__(cin, cout, k, dilation=dilation)
        self.causal_padding = dilation * (k - 1)

    def forward(self, x):
        return super().forward(F.pad(x, (self.causal_padding, 0)))


class TWavenetResBlock(tnn.Module):
    def __init__(self, dim, dilation, k=3, skip=False, cond_dim=None):
        super().__init__()
        self.is_cond = cond_dim is not None
        if self.is_cond:
            self.to_time_cond = tnn.Linear(cond_dim, dim * 2)
        self.conv = TCausalConv1d(dim, dim, k, dilation)
        self.res_conv = TCausalConv1d(dim, dim, 1)
        self.skip_conv = TCausalConv1d(dim, dim, 1) if skip else None

    def forward(self, x, t=None):
        res = self.res_conv(x)
        x = self.conv(x)
        if self.is_cond:
            tc = self.to_time_cond(t)[:, :, None]
            gamma, beta = tc.chunk(2, dim=1)
            x = x * gamma + beta
        x = x.tanh() * x.sigmoid()
        x = x + res
        skip = self.skip_conv(x) if self.skip_conv is not None else None
        return x, skip


class TWavenetStack(tnn.Module):
    def __init__(self, dim, layers, skip=False, cond_dim=None):
        super().__init__()
        self.blocks = tnn.ModuleList(
            [TWavenetResBlock(dim, 2 ** j, skip=skip, cond_dim=cond_dim)
             for j in range(layers)]
        )
        self.has_skip = skip

    def forward(self, xs, t=None):
        if torch.is_tensor(xs):
            xs = [xs] * len(self.blocks)
        outs, skips = [], []
        for x, block in zip(xs, self.blocks):
            h, s = block(x, t)
            outs.append(h)
            skips.append(s)
        return skips if self.has_skip else outs


class TWavenet(tnn.Module):
    """WavenetEncoder (latent_module.py:1003-1032); Wavenet is in==out."""

    def __init__(self, cin, cout, stacks, layers, cond_dim=None):
        super().__init__()
        self.init_conv = TCausalConv1d(cin, cout, 3)
        self.stacks = tnn.ModuleList(
            [TWavenetStack(cout, layers, skip=(s == stacks - 1),
                           cond_dim=cond_dim)
             for s in range(stacks)]
        )
        self.final_conv = TCausalConv1d(cout, cout, 1)

    def forward(self, x, t=None):
        x = self.init_conv(x)
        for stack in self.stacks:
            x = stack(x, t)
        return self.final_conv(sum(x))


class TRMSNorm(tnn.Module):
    def __init__(self, dim, scale=True, dim_cond=None):
        super().__init__()
        self.is_cond = dim_cond is not None
        if self.is_cond:
            self.to_gamma_beta = tnn.Linear(dim_cond, dim * 2)
        self.dim_scale = dim ** 0.5
        if scale:
            self.gamma = tnn.Parameter(torch.ones(dim))
        self.has_scale = scale

    def forward(self, x, cond=None):
        out = F.normalize(x, dim=-1) * self.dim_scale
        if self.has_scale:
            out = out * self.gamma
        if not self.is_cond:
            return out
        gamma, beta = self.to_gamma_beta(cond).chunk(2, dim=-1)
        return out * gamma[:, None, :] + beta[:, None, :]


class TGEGLU(tnn.Module):
    def forward(self, x):
        x, gate = x.chunk(2, dim=-1)
        return F.gelu(gate) * x


class TTranspose(tnn.Module):
    def forward(self, x):
        return x.transpose(1, 2)


def t_feedforward(dim, mult=4, causal_conv=False):
    inner = int(dim * mult * 2 / 3)
    mods = [tnn.Linear(dim, inner * 2), TGEGLU()]
    if causal_conv:
        mods.append(tnn.Sequential(TTranspose(),
                                   TCausalConv1d(inner, inner, 3),
                                   TTranspose()))
    mods.append(tnn.Linear(inner, dim))
    return tnn.Sequential(*mods)


class TAttention(tnn.Module):
    def __init__(self, dim, dim_head, heads):
        super().__init__()
        self.heads, self.scale = heads, dim_head ** -0.5
        inner = dim_head * heads
        self.to_q = tnn.Linear(dim, inner, bias=False)
        self.to_kv = tnn.Linear(dim, inner * 2, bias=False)
        self.to_out = tnn.Linear(inner, dim, bias=False)

    def forward(self, x, context=None):
        ctx = x if context is None else context
        h = self.heads
        q = self.to_q(x)
        k, v = self.to_kv(ctx).chunk(2, dim=-1)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, -1).transpose(1, 2)

        q, k, v = map(split, (q, k, v))
        sim = (q @ k.transpose(-1, -2)) * self.scale
        out = sim.softmax(dim=-1) @ v
        out = out.transpose(1, 2).reshape(x.shape[0], x.shape[1], -1)
        return self.to_out(out)


class TCondTransformer(tnn.Module):
    def __init__(self, dim, depth, dim_head, heads, ff_mult=4,
                 causal_conv=True, dim_cond=None, cross=False):
        super().__init__()
        cond = dim_cond is not None
        self.layers = tnn.ModuleList()
        for _ in range(depth):
            self.layers.append(tnn.ModuleList([
                TRMSNorm(dim, scale=not cond, dim_cond=dim_cond),
                TAttention(dim, dim_head, heads),
                TRMSNorm(dim, scale=not cond, dim_cond=dim_cond)
                if cross else None,
                TAttention(dim, dim_head, heads) if cross else None,
                TRMSNorm(dim, scale=not cond, dim_cond=dim_cond),
                t_feedforward(dim, ff_mult, causal_conv),
            ]))
        self.to_pred = tnn.Sequential(TRMSNorm(dim),
                                      tnn.Linear(dim, dim, bias=False))

    def forward(self, x, t=None, context=None):
        for norm1, attn, norm2, cattn, norm3, ff in self.layers:
            res = x
            x = attn(norm1(x, cond=t)) + res
            if cattn is not None:
                res = x
                x = cattn(norm2(x, cond=t), context=context) + res
            res = x
            x = ff(norm3(x, cond=t)) + res
        return self.to_pred(x)


class TVAE(tnn.Module):
    """SpeechVAEEncoderDecoder (latent_module.py:1035-1142)."""

    def __init__(self, dim, chan_mults, depth=2, dim_head=8, heads=2,
                 vocab=20):
        super().__init__()
        cur = dim
        enc, dec = tnn.ModuleList(), tnn.ModuleList()
        for m in chan_mults:
            enc.append(TWavenet(cur, cur // m, stacks=2, layers=3))
            cur //= m
        first = True
        for m in reversed(chan_mults):
            target = cur * m
            if first:
                cur //= 2
                first = False
            dec.append(TWavenet(cur, target, stacks=2, layers=3))
            cur = target
        self.encoder_wave, self.decoder_wave = enc, dec
        self.decoder_tf = TCondTransformer(dim, depth, dim_head, heads,
                                           causal_conv=True)
        self.decoder_lm = tnn.Linear(dim, vocab)

    def det_forward(self, feat):
        x = feat.transpose(1, 2)
        for e in self.encoder_wave:
            x = e(x)
        mean, _ = x.chunk(2, dim=1)
        x = mean
        for d in self.decoder_wave:
            x = d(x)
        h = self.decoder_tf(x.transpose(1, 2))
        return mean.transpose(1, 2), h, self.decoder_lm(h)


class TLearnedSinPosEmb(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.weights = tnn.Parameter(torch.randn(dim // 2))

    def forward(self, x):
        x = x[:, None].float()
        freqs = x * self.weights[None, :] * 2 * math.pi
        return torch.cat([x, freqs.sin(), freqs.cos()], dim=-1)


def fairseq_pos_table(n, dim, padding_idx=0):
    half = dim // 2
    freq = torch.exp(torch.arange(half).float() * -(math.log(10000) / (half - 1)))
    args = torch.arange(n).float()[:, None] * freq[None, :]
    emb = torch.cat([args.sin(), args.cos()], dim=1)
    if dim % 2:
        emb = torch.cat([emb, torch.zeros(n, 1)], dim=1)
    emb[padding_idx] = 0.0
    return emb


class TDenoiser(tnn.Module):
    """Denoiser `Model` (latent_module.py:709-876)."""

    def __init__(self, dim, latent_dim, depth=2, dim_head=8, heads=2,
                 wavenet_layers=2, wavenet_stacks=2, dim_cond_mult=2,
                 prompt=False, dim_prompt=12, num_latents_m=4,
                 resampler_depth=1):
        super().__init__()
        self.dim = dim
        dim_time = dim * dim_cond_mult
        self.init_conv = tnn.Conv1d(latent_dim, dim, 1)
        self.to_time_cond = tnn.Sequential(
            TLearnedSinPosEmb(dim), tnn.Linear(dim + 1, dim_time), tnn.SiLU()
        )
        self.has_prompt = prompt
        cond_mult = dim_cond_mult * (2 if prompt else 1)
        if prompt:
            self.null_prompt_cond = tnn.Parameter(torch.randn(dim_time))
            self.null_prompt_tokens = tnn.Parameter(
                torch.randn(num_latents_m, dim))
            self.to_prompt_cond = tnn.Sequential(
                tnn.Identity(), tnn.Linear(dim_prompt, dim_time), tnn.SiLU()
            )
            self.perceiver_resampler = TPerceiver(
                dim, dim_prompt, num_latents_m, resampler_depth, dim_head,
                heads)
        self.wavenet = TWavenet(dim, dim, wavenet_stacks, wavenet_layers,
                                cond_dim=dim * cond_mult)
        self.transformer = TCondTransformer(
            dim, depth, dim_head, heads, causal_conv=True,
            dim_cond=dim * cond_mult, cross=prompt,
        )
        self.final_proj = tnn.Linear(dim, latent_dim)

    def forward(self, x, times, mask, prompt=None, drop=False):
        t = self.to_time_cond(times)
        context = None
        if self.has_prompt:
            if drop:
                pc = self.null_prompt_cond[None].expand(x.shape[0], -1)
                context = self.null_prompt_tokens[None].expand(
                    x.shape[0], -1, -1)
            else:
                pc = self.to_prompt_cond(prompt.mean(dim=1))
                context = self.perceiver_resampler(prompt)
            t = torch.cat([t, pc], dim=-1)
        h = self.init_conv(x.transpose(1, 2))
        h = self.wavenet(h, t).transpose(1, 2)
        positions = torch.cumsum(mask.long(), 1) * mask.long()
        table = fairseq_pos_table(mask.shape[1] + 2, self.dim)
        h = h + table[positions]
        h = self.transformer(h, t=t, context=context)
        return self.final_proj(h)


class TPerceiver(tnn.Module):
    """PerceiverResampler (latent_module.py:416-471)."""

    def __init__(self, dim, dim_context, num_latents, depth, dim_head,
                 heads):
        super().__init__()
        self.dim = dim
        self.proj_context = tnn.Linear(dim_context, dim)
        self.latents = tnn.Parameter(torch.randn(num_latents, dim))
        self.layers = tnn.ModuleList(
            [tnn.ModuleList([TAttention(dim, dim_head, heads),
                             t_feedforward(dim, 4, causal_conv=False)])
             for _ in range(depth)]
        )
        self.norm = TRMSNorm(dim)

    def forward(self, prompt):
        b = prompt.shape[0]
        ctx = self.proj_context(prompt)
        x = self.latents[None].expand(b, -1, -1)
        mask = torch.ones(b, x.shape[1], dtype=torch.bool)
        x = x + fairseq_pos_table(x.shape[1] + 2, self.dim)[
            torch.cumsum(mask.long(), 1) * mask.long()]
        for attn, ff in self.layers:
            # cross_attn_include_queries: queries prepended to the context
            x = attn(x, context=torch.cat([x, ctx], dim=1)) + x
            x = ff(x) + x
        return self.norm(x)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

DIM, LATENT, VOCAB = 48, 8, 20


def tree_shapes(t):
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a).shape, t)


def test_vae_conversion_forward_parity():
    torch.manual_seed(0)
    tvae = TVAE(DIM, (3,)).eval()
    params = convert_vae_state(
        {f"encoder.{k}": v for k, v in tvae.state_dict().items()}
    )
    module = SpeechVAEModule(dim=DIM, latent_dim=LATENT, vocab_size=VOCAB,
                             decoder_depth=2, decoder_dim_head=8,
                             decoder_heads=2, chan_mults=(3,))
    # converted tree must match a fresh init structurally
    ref = module.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 4, DIM)), jnp.ones((1, 4), bool),
                      jax.random.PRNGKey(1))["params"]
    assert tree_shapes(ref) == tree_shapes(params)

    b, t = 2, 12
    feat = np.random.default_rng(0).normal(size=(b, t, DIM)).astype(np.float32)
    mask = jnp.ones((b, t), bool)
    with torch.no_grad():
        t_mean, t_feat, t_logits = tvae.det_forward(torch.from_numpy(feat))

    variables = {"params": params}
    params2c = module.apply(variables, jnp.asarray(feat),
                            method="encode_params")
    mean = jnp.split(params2c, 2, axis=-1)[0]
    j_feat, j_logits = module.apply(variables, mean, mask, method="decode")
    np.testing.assert_allclose(np.asarray(mean), t_mean.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_feat), t_feat.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               rtol=1e-3, atol=1e-3)


def _denoiser_pair(prompt: bool):
    torch.manual_seed(1)
    tden = TDenoiser(32, LATENT, prompt=prompt).eval()
    params = convert_denoiser_state(
        {f"model.{k}": v for k, v in tden.state_dict().items()}, "model"
    )
    module = Denoiser(dim=32, latent_dim=LATENT, depth=2, dim_head=8,
                      heads=2, wavenet_layers=2, wavenet_stacks=2,
                      dim_cond_mult=2, condition_on_prompt=prompt,
                      dim_prompt=12, num_latents_m=4, resampler_depth=1)
    return tden, module, params


@pytest.mark.parametrize("drop", [False, True])
def test_denoiser_conversion_forward_parity(drop):
    tden, module, params = _denoiser_pair(prompt=True)
    b, t = 2, 10
    rng = np.random.default_rng(1)
    x = rng.normal(size=(b, t, LATENT)).astype(np.float32)
    pr = rng.normal(size=(b, 6, 12)).astype(np.float32)
    times = np.asarray([3.0, 7.0], np.float32)
    mask = np.ones((b, t), bool)
    with torch.no_grad():
        ref = tden(torch.from_numpy(x), torch.from_numpy(times),
                   torch.from_numpy(mask), prompt=torch.from_numpy(pr),
                   drop=drop)
    out = module.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(times),
        jnp.asarray(mask), prompt=jnp.asarray(pr),
        cond_drop_prob=1.0 if drop else 0.0, deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_denoiser_unconditional_parity():
    tden, module, params = _denoiser_pair(prompt=False)
    b, t = 2, 10
    rng = np.random.default_rng(2)
    x = rng.normal(size=(b, t, LATENT)).astype(np.float32)
    times = np.asarray([1.0, 150.0], np.float32)
    mask = np.ones((b, t), bool)
    with torch.no_grad():
        ref = tden(torch.from_numpy(x), torch.from_numpy(times),
                   torch.from_numpy(mask))
    out = module.apply({"params": params}, jnp.asarray(x),
                       jnp.asarray(times), jnp.asarray(mask),
                       deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=2e-3, atol=2e-3)

    # structure must match a fresh init
    ref_tree = module.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(times), jnp.asarray(mask))["params"]
    assert tree_shapes(ref_tree) == tree_shapes(params)


def test_full_diffusion_state_mapping():
    torch.manual_seed(2)
    tvae = TVAE(DIM, (3,))
    tden = TDenoiser(32, LATENT)
    sd = {f"encoder.model.{k}": v for k, v in tden.state_dict().items()}
    sd.update({f"encoder.speech_decoder.{k}": v
               for k, v in tvae.state_dict().items()})
    tree = convert_diffusion_state(sd)
    assert set(tree) == {"denoiser", "vae"}
    assert "decoder_lm" in tree["vae"]
    assert "final_proj" in tree["denoiser"]
    np.testing.assert_array_equal(
        tree["vae"]["decoder_lm"]["kernel"],
        tvae.decoder_lm.weight.detach().numpy().T,
    )


def test_convert_checkpoint_cli(tmp_path):
    """End-to-end: torch ckpt file -> convert CLI -> orbax dir ->
    load_checkpoint_params round trip."""
    from diffnorm_tpu.cli.convert_checkpoint import main
    from diffnorm_tpu.train.checkpoint import load_checkpoint_params

    torch.manual_seed(3)
    tvae = TVAE(DIM, (3,))
    src = tmp_path / "vae.pt"
    torch.save({"model": {f"encoder.{k}": v
                          for k, v in tvae.state_dict().items()}}, src)
    out = tmp_path / "converted"
    assert main(["--type", "vae", "--input", str(src),
                 "--output", str(out)]) == 0
    restored = load_checkpoint_params(str(out))
    np.testing.assert_allclose(
        np.asarray(restored["params"]["decoder_lm"]["kernel"]),
        tvae.decoder_lm.weight.detach().numpy().T, rtol=1e-6, atol=1e-6,
    )
