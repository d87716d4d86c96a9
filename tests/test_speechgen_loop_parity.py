"""AR speech-generation LOOP parity against the REAL speech_generator.py.

Drives the genuine fairseq/speech_generator.py AutoRegressiveSpeechGenerator
(loaded verbatim) end to end — incremental rollout with per-sentence eos
cutoff, the all-finished early break, post-loop postnet residual,
n_frames_per_step repeat_interleave, gcmvn denormalization, per-row
finalization — and checks our one-scan ar_speech_generate produces
identical finalized features / eos probabilities / lengths.

Both sides share a deterministic toy model (fixed numpy weights): the torch
side exposes the reference's forward_encoder / forward_decoder /
decoder.postnet protocol; the JAX side evaluates the same math through our
generator's encode / decode_step / apply_postnet module protocol.

The toy postnet is POSITIONWISE (a linear map) on purpose: the reference
breaks out of the loop once every row has fired and postnets only the
collected prefix, while our shape-static scan always collects max_iter
frames — with a convolutional postnet the last kernel//2 frames of the
longest row would see different neighbors (documented deviation in
generate/speech_ar.py); a positionwise postnet makes the comparison exact.
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from reference_loader import load_speech_generator  # noqa: E402

from diffnorm_tpu.generate.speech_ar import ARSpeechGenerator  # noqa: E402

B, S, H, V = 3, 5, 16, 20
RAW = 6          # raw feature dim (per frame)
MAX_ITER = 7
PAD = 1


def _weights(k: int, eos_bias: float, seed: int = 10):
    # seed 10 + the 3x eos head: rows cross the eos threshold at distinct
    # steps for bias -3.3 (all fire -> early break) and bias -6.2 (row 0
    # never fires) — asserted explicitly in the tests
    r = np.random.default_rng(seed)
    out_dim = RAW * k
    w = {
        "emb": r.normal(size=(V, H)).astype(np.float32),
        "w_e": (r.normal(size=(H, H)) / np.sqrt(H)).astype(np.float32),
        "w_f": (r.normal(size=(out_dim, H)) / np.sqrt(out_dim)).astype(
            np.float32),
        "pos": r.normal(size=(MAX_ITER, H)).astype(np.float32),
        "w_out": (r.normal(size=(H, out_dim)) / np.sqrt(H)).astype(
            np.float32),
        "w_eos": (3.0 * r.normal(size=(H, 1)) / np.sqrt(H)).astype(
            np.float32),
        "w_p": (r.normal(size=(out_dim, out_dim)) / np.sqrt(out_dim)).astype(
            np.float32),
        "eos_bias": np.float32(eos_bias),
        # eos logit ramps with the step so every row eventually fires when
        # the bias allows it; rows fire at different steps because their
        # pooled encoder summaries differ
        "eos_ramp": np.float32(0.9),
    }
    w["emb"][PAD] = 0.0
    return w


def _inputs(seed: int = 3):
    r = np.random.default_rng(seed)
    src = r.integers(4, V, size=(B, S)).astype(np.int64)
    lengths = np.array([S, 4, 2], np.int64)
    src[1, 4:] = PAD
    src[2, 2:] = PAD
    return src, lengths


# --------------------------------------------------------------- torch side
class _FakeDecoder(torch.nn.Module):
    def __init__(self, w, k):
        super().__init__()
        self.w = {key: torch.from_numpy(np.asarray(v))
                  for key, v in w.items()}
        self.n_frames_per_step = k
        self.out_dim = RAW * k

    def postnet(self, feat):
        return feat @ self.w["w_p"]


class _FakeTTSModel(torch.nn.Module):
    def __init__(self, w, k):
        super().__init__()
        self.w = {key: torch.from_numpy(np.asarray(v))
                  for key, v in w.items()}
        self.decoder = _FakeDecoder(w, k)

    def forward_encoder(self, src_tokens, src_lengths, speaker=None):
        e = self.w["emb"][src_tokens]
        enc = torch.tanh(e @ self.w["w_e"])
        valid = (
            torch.arange(src_tokens.shape[1])[None, :] < src_lengths[:, None]
        ).float()
        pooled = (enc * valid[..., None]).sum(1) / valid.sum(
            1, keepdim=True)
        return {"encoder_out": [enc], "pooled": pooled}

    def forward_decoder(self, prev_feat_out, encoder_out=None,
                        incremental_state=None, target_lengths=None,
                        speaker=None, **kw):
        step = incremental_state.get("step", 0)
        incremental_state["step"] = step + 1
        h = torch.tanh(
            prev_feat_out[:, 0] @ self.w["w_f"] + encoder_out["pooled"]
            + self.w["pos"][step]
        )
        feat = (h @ self.w["w_out"])[:, None]          # [B, 1, out_dim]
        eos = (h @ self.w["w_eos"] + self.w["eos_bias"]
               + self.w["eos_ramp"] * step)[:, None]   # [B, 1, 1]
        attn = torch.ones(
            prev_feat_out.shape[0], encoder_out["encoder_out"][0].shape[1], 1
        )
        return None, eos, {"feature_out": feat, "attn": attn}


# ----------------------------------------------------------------- JAX side
class _ToyTTSModule:
    """Our generator's module protocol (encode/decode_step/apply_postnet via
    .apply) over the same numpy weights."""

    def __init__(self, w, k):
        self.w = {key: jnp.asarray(v) for key, v in w.items()}
        self.n_frames_per_step = k
        self.out_dim = RAW * k

    def apply(self, variables, *args, method=None, mutable=None, rngs=None,
              **kw):
        out = getattr(self, method)(*args)
        if mutable:
            return out, {"cache": {"z": jnp.zeros((1,), jnp.float32)}}
        return out

    def encode(self, src_tokens):
        e = self.w["emb"][src_tokens]
        enc = jnp.tanh(e @ self.w["w_e"])
        mask = src_tokens != PAD
        return enc, mask

    def decode_step(self, prev_feat, enc, enc_mask, position,
                    max_decode_len=0):
        valid = enc_mask.astype(jnp.float32)
        pooled = (enc * valid[..., None]).sum(1) / valid.sum(
            1, keepdims=True)
        h = jnp.tanh(
            prev_feat[:, 0] @ self.w["w_f"] + pooled + self.w["pos"][position]
        )
        feat = h @ self.w["w_out"]
        eos = (h @ self.w["w_eos"])[:, 0] + self.w["eos_bias"] \
            + self.w["eos_ramp"] * position
        return feat, eos

    def apply_postnet(self, feat):
        return feat + feat @ self.w["w_p"]


def _run_reference(w, k, gcmvn_npz=None):
    gen_mod = load_speech_generator()
    model = _FakeTTSModel(w, k)
    data_cfg = types.SimpleNamespace(global_cmvn_stats_npz=gcmvn_npz)
    gen = gen_mod.AutoRegressiveSpeechGenerator(
        model, None, data_cfg, max_iter=MAX_ITER, eos_prob_threshold=0.5
    )
    src, lengths = _inputs()
    sample = {
        "net_input": {
            "src_tokens": torch.from_numpy(src),
            "src_lengths": torch.from_numpy(lengths),
        },
        "speaker": None,
    }
    with torch.no_grad():
        return gen.generate(model, sample)


def _run_ours(w, k, gcmvn_stats=None):
    src, _ = _inputs()
    model = types.SimpleNamespace(module=_ToyTTSModule(w, k))
    gen = ARSpeechGenerator(
        model, {}, vocoder=None, gcmvn_stats=gcmvn_stats,
        max_iter=MAX_ITER, eos_prob_threshold=0.5,
    )
    return gen.generate(src)


def _assert_match(finalized, ours, k, expect_lens):
    assert [len(f["feature"]) for f in finalized] == expect_lens
    for i, (ref, mine) in enumerate(zip(finalized, ours)):
        assert len(mine["feature"]) == len(ref["feature"]), f"row {i}"
        np.testing.assert_allclose(
            mine["feature"], ref["feature"].numpy(), rtol=1e-4, atol=1e-5,
            err_msg=f"row {i}",
        )
        np.testing.assert_allclose(
            mine["eos_prob"], ref["eos_prob"].numpy(), rtol=1e-4, atol=1e-6,
            err_msg=f"row {i}",
        )


def test_all_rows_fire_with_early_break():
    """Every row fires before max_iter (the reference breaks out early at
    the last firing step); finalized features/eos/lengths must match our
    always-max_iter scan on each row's [:out_len] prefix."""
    w = _weights(k=1, eos_bias=-3.3)
    finalized = _run_reference(w, k=1)
    ours = _run_ours(w, k=1)
    lens = [len(f["feature"]) for f in finalized]
    assert max(lens) < MAX_ITER and len(set(lens)) > 1  # break + distinct
    _assert_match(finalized, ours, 1, lens)


def test_unfired_row_runs_to_max_iter():
    """A row whose eos never crosses the threshold keeps the max_iter
    length on both sides."""
    w = _weights(k=1, eos_bias=-6.2)
    finalized = _run_reference(w, k=1)
    lens = [len(f["feature"]) for f in finalized]
    assert MAX_ITER in lens and min(lens) < MAX_ITER
    _assert_match(finalized, _run_ours(w, k=1), 1, lens)


def test_frames_per_step_and_gcmvn(tmp_path):
    """k=2 stacked frames + gcmvn stats: the reference reshapes to raw_dim,
    denormalizes (x*std + mean), and repeat_interleaves eos/lengths by k —
    ours must agree elementwise."""
    w = _weights(k=2, eos_bias=-3.3)
    mean = np.linspace(-1.0, 1.0, RAW).astype(np.float32)
    std = np.linspace(0.5, 2.0, RAW).astype(np.float32)
    npz = tmp_path / "gcmvn.npz"
    np.savez(npz, mean=mean, std=std)
    finalized = _run_reference(w, k=2, gcmvn_npz=str(npz))
    ours = _run_ours(w, k=2, gcmvn_stats={"mean": mean, "std": std})
    lens = [len(f["feature"]) for f in finalized]
    assert all(n % 2 == 0 for n in lens)  # out_lens scaled by k
    _assert_match(finalized, ours, 2, lens)
