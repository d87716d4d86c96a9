"""Decode-LOOP parity on the REAL model (not toy weights).

test_generator_loop_parity.py pins the loop mechanics with an injected toy
decoder; this drives the VERBATIM full nar_s2ut_conformer model (real
S2TConformerEncoder + real TransformerUnitDecoder, reference_loader.
load_nar_full_model) through the VERBATIM IterativeRefinementGenerator and
checks our jitted mask_predict_decode on the CONVERTED weights produces
identical unit hypotheses — the complete serving path, model and loop both
genuine (reference-matching flags: adaptive=False, place_eos=False).
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_loader import (  # noqa: E402
    load_dictionary,
    load_iterative_refinement_generator,
    load_nar_full_model,
)

from diffnorm_tpu.config import Config  # noqa: E402
from diffnorm_tpu.registry import TASKS  # noqa: E402

PAD = 1
MAX_ITER = 4
NDIM, NFFN, NHEADS, NLAYERS, NK, NVOCAB = 32, 64, 2, 2, 7, 14


class _CudaFree:
    def __enter__(self):
        self._real = torch.Tensor.to

        def to(t, *a, **k):
            if k.get("device") == "cuda":
                k = {x: v for x, v in k.items() if x != "device"}
            a = tuple(x for x in a if x != "cuda")
            return self._real(t, *a, **k) if (a or k) else t

        torch.Tensor.to = to
        return self

    def __exit__(self, *exc):
        torch.Tensor.to = self._real


@pytest.mark.slow
def test_real_nar_model_decode_loop_matches_reference():
    from test_train_trajectory_parity import _nar_args

    m = load_nar_full_model()
    ig = load_iterative_refinement_generator()
    dmod = load_dictionary()
    d = dmod.Dictionary()
    for u in range(NVOCAB - 4):
        d.add_symbol(str(u))
    task_ns = types.SimpleNamespace(
        args=types.SimpleNamespace(target_is_code=True),
        target_dictionary=d, multitask_tasks={},
    )
    torch.manual_seed(11)
    ref = m.NARS2UTConformerModel.build_model(_nar_args(), task_ns)
    ref.eval()
    sd = {k: v.detach() for k, v in ref.state_dict().items()}

    rng = np.random.default_rng(0)
    B, S = 3, 40
    src = rng.normal(size=(B, S, 80)).astype(np.float32)
    lengths = np.array([40, 33, 21], np.int64)
    for i, n in enumerate(lengths):
        src[i, n:] = 0.0

    # pin the canvas lengths on both sides (a random-init length head can
    # predict up to 255, past our static max_len canvas)
    TRUE_LEN = torch.tensor([12, 9, 7])
    ref.decoder.forward_length_prediction = (
        lambda *a, **k: TRUE_LEN.clone())

    gen = ig.IterativeRefinementGenerator(
        d, models=None, max_iter=MAX_ITER, beam_size=1, adaptive=False,
    )
    sample = {"net_input": {"src_tokens": torch.from_numpy(src),
                            "src_lengths": torch.from_numpy(lengths)}}
    with _CudaFree(), torch.no_grad():
        finalized = gen.generate([ref], sample)

    # ---- ours: converted weights + the jitted one-scan decode ----
    from diffnorm_tpu.generate.mask_predict import mask_predict_decode
    from diffnorm_tpu.utils.convert_weights import convert_nar_state

    cfg = Config(
        arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
        encoder_layers=NLAYERS, decoder_layers=NLAYERS,
        encoder_embed_dim=NDIM, encoder_ffn_embed_dim=NFFN,
        encoder_attention_heads=NHEADS, decoder_attention_heads=NHEADS,
        decoder_embed_dim=NDIM, decoder_ffn_embed_dim=NFFN,
        conv_channels=NDIM, depthwise_conv_kernel_size=NK,
        target_code_size=NVOCAB - 4, label_smoothing=0.2, lr=5e-4,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    )
    task = TASKS.get("dummy_nar").setup_task(cfg)
    model = task.build_model()
    variables = convert_nar_state(sd)

    tokens, scores, n_steps = mask_predict_decode(
        model, variables, jnp.asarray(src),
        jnp.asarray(lengths.astype(np.int32)),
        max_iter=MAX_ITER, max_len=32, true_length=jnp.asarray([12, 9, 7]),
        place_eos=False, adaptive=False,
    )
    tokens = np.asarray(tokens)
    scores = np.asarray(scores)

    for i, hyp in enumerate(f[0] for f in finalized):
        ref_tok = hyp["tokens"].numpy()
        assert hyp["steps"] == MAX_ITER  # adaptive off: full loop both sides
        non_pad = tokens[i] != PAD
        np.testing.assert_array_equal(tokens[i][non_pad], ref_tok,
                                      err_msg=f"row {i}")
        np.testing.assert_allclose(
            scores[i][non_pad], hyp["positional_scores"].numpy(),
            rtol=5e-3, atol=5e-4, err_msg=f"row {i}")
