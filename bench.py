"""Headline benchmark: DiffNorm DDIM normalization throughput on one chip.

Runs the full normalization kernel (frozen-VAE encode -> 49-step DDIM
reverse scan over the 512-d denoiser -> VAE decode -> unit argmax) at the
reference's released configuration (latent 128, T=200, start_step 50 —
scripts/diffusion/unit_gen.sh) in bfloat16 compute, and reports the
real-time factor: seconds of (20 ms/unit) audio normalized per wall second.

vs_baseline is RTF / 5.0 — BASELINE.json's driver target is >=5x real-time
per v5e chip at parity quality (the reference publishes no perf numbers).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys as _sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: first compiles through the TPU tunnel take
# minutes; cached executables bring re-runs (and the driver's end-of-round
# bench) down to seconds
jax.config.update("jax_compilation_cache_dir", "/tmp/diffnorm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

# per-tensor (scalar) int8 scale granularity: measured fastest on v5e for
# the VPU-op-bound DDIM step (RTF 309 -> 324; PERFORMANCE.md "Int8 scale
# granularity") with parity pinned by
# tests/test_variants.py::test_int8_scale_granularity_parity.
# Set =0 to restore per-out-channel weight / per-token activation scales.
import os as _os

_os.environ.setdefault("DIFFNORM_INT8_WSCALAR", "1")
_os.environ.setdefault("DIFFNORM_INT8_ASCALAR", "1")
# software-pipelined FF kernel (ops/pallas_ffpipe.py): row b's proj_in/GEGLU
# overlaps row b-1's conv/proj_out — RTF 332 -> 338 (PERFORMANCE.md); parity
# pinned by tests/test_pallas_ops.py::test_ffpipe_kernel_matches_module.
# RETIRED as the default by static activation scales (XLA-FF+static 371.7
# beats ffpipe+static 347.8 — the kernel's raison d'etre was hiding the
# dynamic max-abs pass); DIFFNORM_FFPIPE=1 re-enables it.
if _os.environ.get("BENCH_INT8_STATIC", "1") == "1":
    _os.environ.setdefault("DIFFNORM_FFPIPE", "0")
else:
    _os.environ.setdefault("DIFFNORM_FFPIPE", "1")

BATCH = int(__import__("os").environ.get("BENCH_BATCH", 64))  # reference driver batches ~100
SEQ = 128
START_STEP = 50
SECONDS_PER_UNIT = 0.02  # 50 Hz unit rate


def _device_peak_flops(int8: bool = False):
    """Dense-matmul peak of the attached chip by device_kind (bf16, or int8
    where the MXU doubles), for the MFU denominators. Override with
    BENCH_PEAK_TFLOPS (in TFLOP/s). Returns None when unknown."""
    env = _os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    table = [  # (substring, bf16 peak, int8 multiplier)
        ("v6", 918e12, 2.0), ("v5p", 459e12, 1.0),
        ("v5 lite", 197e12, 2.0), ("v5e", 197e12, 2.0),
        # some runtimes report v5p as plain "TPU v5"; assume the larger
        # core so MFU is an underestimate rather than silently null
        ("v5", 459e12, 1.0),
        ("v4", 275e12, 1.0), ("v3", 123e12, 1.0), ("v2", 45e12, 1.0),
    ]
    for sub, peak, mult in table:
        if sub in kind:
            return peak * (mult if int8 else 1.0)
    print(f"# warning: unrecognized device_kind {kind!r}; "
          "set BENCH_PEAK_TFLOPS to get mfu_pct", file=_sys.stderr)
    return None


def _mfu_pct(jitted, args, seconds: float, repeats: int = 1,
             int8: bool = False):
    """MFU of one timed unit from XLA's cost analysis of the compiled
    program (flops / repeats) against the chip's dense peak.

    ONLY sound for programs whose hot ops are NOT inside lax.scan /
    while_loop — XLA counts a loop body ONCE regardless of trip count.
    The scan-shaped benches (DDIM, NAR decode, e2e) use the analytic
    `_param_flops` model instead. The persistent compile cache makes the
    AOT lower+compile here a cache hit of the already-benched program."""
    try:
        compiled = jitted.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        peak = _device_peak_flops(int8=int8)
        if flops <= 0 or not peak or seconds <= 0:
            return None
        return round(100.0 * flops / repeats / seconds / peak, 1)
    except Exception:
        return None


def _kernels_numel(tree, exclude=("embedding",)) -> int:
    """Sum of matmul/conv kernel elements (ndim >= 2 leaves; embedding
    tables are gathers, not matmuls)."""
    import jax as _jax

    total = 0
    for path, leaf in _jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(
            str(getattr(p, "key", p)) for p in path).lower()
        if any(e in name for e in exclude):
            continue
        if getattr(leaf, "ndim", 0) >= 2:
            total += int(np.prod(leaf.shape))
    return total


def _param_flops(tree, b: int, t: int, attn_layers: int = 0,
                 attn_dim: int = 0, t_kv: int | None = None) -> float:
    """Analytic forward FLOPs from the REAL parameter tree: every >=2-dim
    kernel is applied as a matmul/conv over the [B, T] token grid
    (2 FLOP/MAC x B x T x numel), plus the activation-activation attention
    terms (4*B*T*T_kv*dim per layer: scores + weighted sum) that carry no
    weights. Within ~10% for matmul-dominated nets with static shapes;
    the published MFU denominators in PERFORMANCE.md state this model."""
    flops = 2.0 * b * t * _kernels_numel(tree)
    if attn_layers and attn_dim:
        flops += attn_layers * 4.0 * b * t * (t_kv or t) * attn_dim
    return flops


def _mfu_from_flops(flops: float, seconds: float, int8: bool = False):
    peak = _device_peak_flops(int8=int8)
    if not peak or seconds <= 0 or not flops:
        return None
    return round(100.0 * flops / seconds / peak, 1)


def main():
    from diffnorm_tpu.config import Config
    from diffnorm_tpu.models.diffusion import LatentDiffusionModel, ddim_sample
    from diffnorm_tpu.registry import _import_all

    _import_all()
    # int8 W8A8 inference matmuls by default (2x MXU rate on v5e;
    # 99%+ unit agreement with the bf16 path — tests/test_variants.py);
    # BENCH_INT8=0 falls back to pure bf16
    use_int8 = __import__("os").environ.get("BENCH_INT8", "1") != "0"
    cfg = Config(
        hidden_dim=512, latent_dim=128, feature_dim=768, timesteps=200,
        vocab_size=1004, dtype="bfloat16", quant_int8=use_int8,
    )
    model = LatentDiffusionModel.build_model(cfg)

    rng = jax.random.PRNGKey(0)
    feat = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, SEQ, 768)), jnp.float32
    )
    mask = jnp.ones((BATCH, SEQ), bool)
    variables = model.module.init(
        {"params": rng}, feat, mask, rng, deterministic=True
    )
    # inference-time weights in bf16: halves the HBM weight stream and
    # removes per-use f32->bf16 casts (params stay f32 for training)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables,
    )

    # Calibrated per-site activation scales (default ON; BENCH_INT8_STATIC=0
    # reverts): removes every max-abs reduce from the scan's quantize
    # chains — the serialized second elementwise pass the pipelined FF
    # kernel could only partially hide. Measured B64xT128: XLA-FF dynamic
    # 331.7 / ffpipe dynamic 339.9 / ffpipe+static 347.8 / XLA-FF+static
    # 371.7 — so static scales retire ffpipe as the default (parity pinned
    # by tests/test_variants.py::test_int8_static_scale_parity).
    use_static = __import__("os").environ.get("BENCH_INT8_STATIC", "1") == "1"
    if use_int8 and use_static:
        from diffnorm_tpu.models.diffusion import calibrate_act_scales

        variables = calibrate_act_scales(
            model, variables, feat, mask, jax.random.PRNGKey(11),
            start_step=START_STEP,
        )
        __import__("os").environ["DIFFNORM_INT8_STATIC"] = "1"

    REPEATS = 4

    def run_many(v, f, m, r):
        """REPEATS full normalizations inside one jit (the axon tunnel's
        block_until_ready is a no-op, so timing syncs on a scalar checksum;
        repeating inside the program amortizes the ~30 ms tunnel latency)."""
        def body(carry, i):
            units, recon = ddim_sample(
                model, v, f, m, jax.random.fold_in(r, i),
                start_step=START_STEP,
            )
            return carry + jnp.sum(units), ()
        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                jnp.arange(REPEATS))
        return total

    fn = jax.jit(run_many)
    _ = float(fn(variables, feat, mask, rng))  # warmup/compile

    # measure tunnel round-trip latency with a trivial program
    tiny = jax.jit(lambda x: jnp.sum(x))
    _ = float(tiny(jnp.ones((8,))))
    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(tiny(jnp.ones((8,))))
        lat.append(time.perf_counter() - t0)
    latency = min(lat)

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(fn(variables, feat, mask, jax.random.fold_in(rng, i)))
        times.append(time.perf_counter() - t0)

    wall = max(min(times) - latency, 1e-9) / REPEATS
    audio_seconds = BATCH * SEQ * SECONDS_PER_UNIT
    rtf = audio_seconds / wall
    # analytic MFU (the 49-step reverse scan hides its body from XLA's
    # cost analysis): per-step denoiser matmuls from the real param tree +
    # one frozen-VAE encode/decode. The FiLM/adaptive-norm projections
    # (`to_time_cond`/`to_gamma_beta`, [2048 x 1024] each — the bulk of the
    # denoiser's parameters) are HOISTED out of the scan
    # (precompute_step_conds) and run ONCE per call over [steps x B, 1]
    # rows, so they are excluded from the per-step term and added once.
    p = variables["params"]
    den = {k: v for k, v in p.items() if k != "vae"}
    film = ("to_time_cond", "to_gamma_beta", "time_proj")
    den_core = _kernels_numel(den, exclude=("embedding",) + film)
    film_k = _kernels_numel(den) - den_core
    per_step = (2.0 * BATCH * SEQ * den_core
                + 12 * 4.0 * BATCH * SEQ * SEQ * 512)
    flops = (START_STEP - 1) * per_step
    flops += 2.0 * (START_STEP - 1) * BATCH * film_k  # hoisted, T=1 rows
    flops += _param_flops(p.get("vae", {}), BATCH, SEQ,
                          attn_layers=6, attn_dim=768)
    mfu = _mfu_from_flops(flops, wall, int8=use_int8)
    print(json.dumps({
        "metric": "diffnorm_ddim_normalization_rtf",
        "value": round(rtf, 3),
        "unit": f"audio_s/wall_s (B{BATCH}xT128, 49 DDIM steps, "
                f"{'int8-W8A8' if use_int8 else 'bf16'}, 1 chip)",
        "vs_baseline": round(rtf / 5.0, 3),
        "mfu_pct": mfu,
    }))


def main_nar():
    """Secondary metric (BASELINE: NAR decode utts/sec/chip): full-size
    nar_s2ut_conformer mask-predict decode, 15 iterations, B=16 x 480 fbank
    frames. Run with `python bench.py --nar`."""
    from diffnorm_tpu.config import Config
    from diffnorm_tpu.generate.mask_predict import mask_predict_decode
    from diffnorm_tpu.registry import TASKS, _import_all

    _import_all()
    # int8 W8A8 decode, default ON with static scales (BENCH_NAR_INT8=0
    # reverts to bf16). Round-1 found dynamic int8 a WASH here (the decoder
    # matmuls are too small to pay the dynamic quant chains: bf16 590.8 vs
    # dynamic 606.3); static calibrated scales remove the max-abs passes
    # and make it a clear win: **685.3 utts/s (+16%)**.
    nar_int8 = __import__("os").environ.get("BENCH_NAR_INT8", "1") == "1"
    nar_static = (nar_int8 and __import__("os").environ.get(
        "BENCH_INT8_STATIC", "1") == "1")
    cfg = Config(
        arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
        target_code_size=1000, label_smoothing=0.2, lr=5e-4,
        dtype="bfloat16", quant_int8=nar_int8,
    )
    task = TASKS.get("dummy_nar").setup_task(cfg)
    model = task.build_model()
    # ~4.8 s utterances at 10 ms fbank shift; B16 is the measured optimum
    # for the bf16 decode — BENCH_BATCH sweeps it (the int8-static path
    # shifted the e2e chain's optimum upward, see PERFORMANCE.md)
    b = int(__import__("os").environ.get("BENCH_BATCH", 16))
    frames = 480
    batch = task.dummy_batch(b, frames)
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables,
    )
    if nar_static:
        from diffnorm_tpu.ops.quant import calibrate_apply

        variables = calibrate_apply(
            model.module.apply, variables,
            jnp.asarray(batch["src_tokens"]),
            jnp.asarray(batch["src_lengths"]),
            jnp.asarray(batch["prev_target"]),
            tgt_tokens=jnp.asarray(batch["target"]),
            deterministic=True,
        )
        __import__("os").environ["DIFFNORM_INT8_STATIC"] = "1"

    # BENCH_NAR_EXIT=0 restores the round-3 fixed-trip scan (freeze-only);
    # default measures the adaptive early-exit while_loop — same outputs,
    # wall-clock scales with the iterations actually used (reported as
    # mean_steps in the JSON)
    early_exit = __import__("os").environ.get("BENCH_NAR_EXIT", "1") == "1"
    _nar_decode_bench(model, variables, batch, b, frames, nar_int8,
                      early_exit, metric="nar_s2ut_decode_throughput")


def _nar_decode_bench(model, variables, batch, b, frames, nar_int8,
                      early_exit, metric, extra=None):
    """Shared NAR mask-predict decode measurement (random-init easy-batch
    bound AND the trained-model difficulty mode share it)."""
    from diffnorm_tpu.generate.mask_predict import mask_predict_decode

    REPEATS = 16

    def run_many(v, s, l):
        """REPEATS full decodes inside one jitted program (single decodes
        are ~20 ms — smaller than the tunnel's latency jitter; the input
        perturbation depends on the loop index so XLA cannot hoist the
        loop-invariant decode)."""
        def body(carry, i):
            tot, steps, maxs = carry
            si = s + (i.astype(s.dtype) * 1e-6)
            toks, _, n_steps = mask_predict_decode(
                model, v, si, l, max_iter=15, max_len=256,
                early_exit=early_exit,
            )
            n_steps = n_steps.astype(jnp.int32)
            # the while_loop iterates until the SLOWEST row finishes —
            # every in-flight row pays the full-batch decoder — so the
            # per-repeat max is the actual decoder trip count (advisor r4)
            return (tot + jnp.sum(toks), steps + jnp.sum(n_steps),
                    maxs + jnp.max(n_steps)), ()
        (total, steps, maxs), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                   jnp.zeros((), jnp.int32)),
            jnp.arange(REPEATS)
        )
        return total, steps, maxs

    fn = jax.jit(run_many)
    src = jnp.asarray(batch["src_tokens"])
    lens = jnp.asarray(batch["src_lengths"])
    _, steps_dev, maxs_dev = fn(variables, src, lens)  # compile
    mean_steps = float(steps_dev) / (b * REPEATS)
    max_steps = float(maxs_dev) / REPEATS  # mean over repeats of per-batch max

    tiny = jax.jit(lambda x: jnp.sum(x))
    _ = float(tiny(jnp.ones((8,))))
    t0 = time.perf_counter()
    _ = float(tiny(jnp.ones((8,))))
    latency = time.perf_counter() - t0

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out_dev, _s, _m = fn(variables, src, lens)
        _ = float(out_dev)
        times.append(time.perf_counter() - t0)
    wall = max(min(times) - latency, 1e-9)
    utts_per_sec = b * REPEATS / wall
    # analytic MFU (decode iterations live in a scan): conformer encode
    # once + (max_iter+1) decoder evaluations over the 256-wide canvas
    p = variables["params"]
    t_enc = frames // 4
    enc_flops = _param_flops(p["encoder"], b, t_enc,
                             attn_layers=16, attn_dim=256)
    dec_flops = _param_flops(p["decoder"], b, 256, attn_layers=6,
                             attn_dim=256)  # base arch: decoder dim 256
    dec_flops += 6 * 4.0 * b * 256 * t_enc * 256  # cross-attention
    # decoder evaluations actually executed: 16 for the fixed-trip scan;
    # under early exit the while_loop runs max-over-rows(+1) iterations
    # per repeat, and every in-flight row pays the full-batch decoder —
    # so FLOPs (hence MFU) come from the measured per-repeat MAX, not the
    # per-row mean (advisor r4; the mean is still reported as the
    # per-utterance decode-difficulty statistic)
    n_passes = 16 if not early_exit else max(max_steps + 1.0, 1.0)
    flops = enc_flops + n_passes * dec_flops
    mfu = _mfu_from_flops(flops, wall / REPEATS, int8=nar_int8)
    out = {
        "metric": metric if not early_exit else metric + "_early_exit",
        "value": round(utts_per_sec, 3),
        "unit": f"utts/s (B{b}, {frames} fbank frames, 16 decode passes, "
                "1 chip)",
        "vs_baseline": round(utts_per_sec / 5.0, 3),
        "mfu_pct": mfu,
        "mean_steps": round(mean_steps, 2),
        "early_exit": early_exit,
    }
    if early_exit:
        out["max_steps"] = round(max_steps, 2)
        out["unit"] = (f"utts/s (B{b}, {frames} fbank frames, adaptive "
                       "exit <=15 iters, 1 chip)")
    if extra:
        out.update(extra)
    print(json.dumps(out))


def main_nar_trained():
    """Decode difficulty from a TRAINED model (VERDICT r4: no trained-model
    mean_steps had ever been published — the random-init bench freezes
    after one iteration, so its early-exit throughput is an easy-batch
    upper bound). Trains the FULL-SIZE nar_s2ut_conformer on a synthetic
    template corpus ON THE CHIP (frame-level corruption like real unit
    noise; BENCH_TRAINED_UPDATES, default 1500), then runs the identical
    decode measurement on in-distribution noisy sources. Reported
    mean_steps/max_steps are what the adaptive exit actually pays on a
    model whose confidence profile drives skeptical re-masking. Run with
    `python bench.py --nar-trained`."""
    import os

    from diffnorm_tpu.config import Config, make_trainer_config
    from diffnorm_tpu.registry import TASKS, _import_all
    from diffnorm_tpu.train.trainer import Trainer

    _import_all()
    b = int(os.environ.get("BENCH_BATCH", 16))
    frames = int(os.environ.get("BENCH_SEQ", 480))
    updates = int(os.environ.get("BENCH_TRAINED_UPDATES", 1500))
    code = 1000
    tgt_len = 96  # reduced units per utterance (~2 units/enc frame at 4x)
    n_tpl = 16

    cfg = Config(
        arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
        target_code_size=code, label_smoothing=0.2, lr=1e-3,
        warmup_updates=100, clip_norm=2.0, fused_train_step=_fused_flag(),
    )
    if os.environ.get("BENCH_PRNG", "rbg") == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")
    task = TASKS.get("dummy_nar").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()

    # template corpus: n_tpl (source prototype, clean unit template) pairs;
    # each drawn utterance adds source noise + 10% aligned unit
    # substitutions (non-memorizable idiosyncratic noise — keeps decode
    # confidence real, tests/test_diffnorm_effect.py world)
    rng = np.random.default_rng(0)
    src_proto = rng.normal(size=(n_tpl, frames, 80)).astype(np.float32)
    templates = rng.integers(4, 4 + code, size=(n_tpl, tgt_len))

    def draw_batch(r):
        ti = r.integers(0, n_tpl, size=b)
        src = src_proto[ti] + 0.1 * r.normal(
            size=(b, frames, 80)).astype(np.float32)
        tgt = templates[ti].copy()
        sub = r.random((b, tgt_len)) < 0.10
        tgt[sub] = r.integers(4, 4 + code, size=int(sub.sum()))
        tgt[:, -1] = 2  # eos
        batch = {
            "src_tokens": src.astype(np.float32),
            "src_lengths": np.full((b,), frames, np.int32),
            "target": tgt.astype(np.int32),
        }
        return task.prepare_batch(batch, r)

    trainer = Trainer(make_trainer_config(cfg), task, model, crit)
    state = trainer.init_state(jax.random.PRNGKey(0), draw_batch(rng))
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    final_loss = None
    for u in range(updates):
        state, mets = trainer.train_step(
            state, [draw_batch(rng)], jax.random.fold_in(key, u))
        # one scalar pull per step: queuing device steps with NO host sync
        # degrades the tunnel to seconds/step (measured 8 s/update without
        # this line, ~60 ms with it)
        final_loss = float(mets["loss"])
    train_wall = time.time() - t0
    print(json.dumps({"metric": "nar_trained_bench_training",
                      "value": round(final_loss, 4), "unit":
                      f"final loss after {updates} updates "
                      f"({train_wall:.0f}s on-chip)",
                      "vs_baseline": 0.0}))

    # decode in the SERVING configuration (bf16 compute + int8-static
    # matmuls, exactly main_nar's model build) — the trained params slot
    # into a fresh eval-model whose cfg carries dtype/quant flags; the
    # training model computes f32 without quant wrappers, and measuring
    # THAT conflates decode difficulty with a config no one serves
    # (first run of this bench did: 62.7 utts/s at 1.6% MFU)
    nar_int8 = os.environ.get("BENCH_NAR_INT8", "1") == "1"
    eval_cfg = Config(
        arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
        target_code_size=code, label_smoothing=0.2, lr=5e-4,
        dtype="bfloat16", quant_int8=nar_int8,
    )
    eval_task = TASKS.get("dummy_nar").setup_task(eval_cfg)
    eval_model = eval_task.build_model()
    variables = {"params": jax.device_get(state.params),
                 **jax.device_get(state.model_state)}
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, variables)
    eval_batch = draw_batch(np.random.default_rng(12345))  # fresh noise
    if nar_int8 and os.environ.get("BENCH_INT8_STATIC", "1") == "1":
        from diffnorm_tpu.ops.quant import calibrate_apply

        variables = calibrate_apply(
            eval_model.module.apply, variables,
            jnp.asarray(eval_batch["src_tokens"]),
            jnp.asarray(eval_batch["src_lengths"]),
            jnp.asarray(eval_batch["prev_target"]),
            tgt_tokens=jnp.asarray(eval_batch["target"]),
            deterministic=True,
        )
        os.environ["DIFFNORM_INT8_STATIC"] = "1"
    early_exit = os.environ.get("BENCH_NAR_EXIT", "1") == "1"
    _nar_decode_bench(
        eval_model, variables, eval_batch, b, frames, nar_int8, early_exit,
        metric="nar_s2ut_decode_trained",
        extra={"train_updates": updates,
               "final_train_loss": round(final_loss, 4)})


def _fused_flag():
    """BENCH_FUSED=0 forces the split grad+apply path (A/B the fused
    single-program step); unset/1 = trainer auto (fused on TPU)."""
    v = _os.environ.get("BENCH_FUSED")
    return None if v is None else bool(int(v))


def _measure_train_ups(trainer, state, batch, n: int = 8):
    """Shared train-step timing scaffold: pre-shard the (constant) batch
    (measures chip step throughput, not tunnel H2D — real training overlaps
    uploads via parallel.mesh.prefetch_to_device), compile+warm, calibrate
    the tunnel round-trip with a tiny program, then time n steps with one
    final scalar sync. Returns (updates/s, final state)."""
    from diffnorm_tpu.parallel.mesh import shard_batch

    batch = shard_batch(batch, trainer.mesh)
    rng = jax.random.PRNGKey(1)
    for i in range(2):  # compile + warm
        state, m = trainer.train_step(state, [batch],
                                      jax.random.fold_in(rng, i))
    tiny = jax.jit(lambda x: jnp.sum(x))
    _ = float(tiny(jnp.ones((8,))))
    t0 = time.perf_counter()
    _ = float(tiny(jnp.ones((8,))))
    latency = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(n):
        state, m = trainer.train_step(state, [batch],
                                      jax.random.fold_in(rng, 100 + i))
    _ = float(m["loss"])  # sync
    wall = max(time.perf_counter() - t0 - latency, 1e-9)
    return n / wall, state, _train_mfu(trainer, state, batch, wall / n)


def _train_mfu(trainer, state, batch, step_seconds: float):
    """MFU of one optimizer update: XLA cost analysis of the grad program +
    the apply program (both already compiled — the persistent cache makes
    the AOT lookup free) over the measured step time."""
    try:
        rng = jax.random.PRNGKey(0)

        def _flops(compiled):
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0))

        if getattr(trainer, "_use_fused", False):
            # fused single-program step: one lowering, already compiled
            flops = _flops(
                trainer._jit_fused.lower(state, batch, rng, None).compile())
        else:
            flops = _flops(
                trainer._jit_grad.lower(state, batch, rng).compile())
            grads, _vec, _mut = trainer._jit_grad(state, batch, rng)
            flops += _flops(trainer._jit_apply.lower(
                state, grads, jnp.asarray(1.0), None).compile())
        peak = _device_peak_flops()
        if flops <= 0 or not peak or step_seconds <= 0:
            return None
        return round(100.0 * flops / step_seconds / peak, 1)
    except Exception:
        return None


def main_train():
    """Tertiary metric: latent-diffusion train-step throughput (the stage-2
    training workload, scripts/diffusion/train.sh config at latent 128) —
    full fwd+bwd+adam per step, bf16 compute, f32 params. Run with
    `python bench.py --train`."""
    import os

    from diffnorm_tpu.config import Config, make_trainer_config
    from diffnorm_tpu.registry import TASKS, _import_all
    from diffnorm_tpu.train.trainer import Trainer

    _import_all()
    if os.environ.get("BENCH_PRNG", "rbg") == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")
    b = int(os.environ.get("BENCH_BATCH", 16))
    seq = int(os.environ.get("BENCH_SEQ", 256))
    cfg = Config(
        task="speech_diffusion_discrete", arch="diff_discrete",
        criterion="ddpm_discrete_loss", hidden_dim=512, latent_dim=128,
        feature_dim=768, timesteps=200, target_code_size=1000,
        dtype="bfloat16", lr=5e-4, warmup_updates=10,
    )
    task = TASKS.get("speech_diffusion_discrete").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    trainer = Trainer(make_trainer_config(cfg), task, model, crit)
    batch = task.dummy_batch(b, seq)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    ups, _state, mfu = _measure_train_ups(trainer, state, batch)
    print(json.dumps({
        "metric": "diffusion_train_step_throughput",
        "value": round(ups * b * seq, 1),
        "unit": f"unit_tokens/s (B{b}xT{seq} fwd+bwd+adam, bf16, 1 chip)",
        "vs_baseline": round(ups, 3),
        "mfu_pct": mfu,
    }))


def main_vae_train():
    """Speech-VAE train-step throughput (stage-1 workload,
    scripts/vae/train.sh: full-size speech_vae_decoder at latent 128,
    lr 5e-4, 200k updates). fwd+bwd+adam, bf16 compute. Run with
    `python bench.py --vae-train`."""
    import os

    from diffnorm_tpu.config import Config, make_trainer_config
    from diffnorm_tpu.registry import TASKS, _import_all
    from diffnorm_tpu.train.trainer import Trainer

    _import_all()
    if os.environ.get("BENCH_PRNG", "rbg") == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")
    # B64xT256 = 16k unit tokens/step ~= the recipe's 15k max-tokens
    # (scripts/vae/train.sh); the old B16 default under-filled the chip
    # (27.6% MFU at B16 -> 51.2% at B64, round-5 sweep in PERFORMANCE.md)
    b = int(os.environ.get("BENCH_BATCH", 64))
    seq = int(os.environ.get("BENCH_SEQ", 256))
    cfg = Config(
        task="dummy_vae", arch="speech_vae_decoder",
        criterion="speech_vae_decoder_loss", feature_dim=768, latent_dim=128,
        target_code_size=1000, dtype="bfloat16", lr=5e-4, warmup_updates=10,
    )
    task = TASKS.get("dummy_vae").setup_task(cfg)
    trainer = Trainer(make_trainer_config(cfg), task, task.build_model(),
                      task.build_criterion())
    batch = task.dummy_batch(b, seq)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    ups, _state, mfu = _measure_train_ups(trainer, state, batch)
    print(json.dumps({
        "metric": "vae_train_step_throughput",
        "value": round(ups * b * seq, 1),
        "unit": f"unit_tokens/s (B{b}xT{seq} fwd+bwd+adam, bf16, 1 chip)",
        "vs_baseline": round(ups, 3),
        "mfu_pct": mfu,
    }))


def main_prepare():
    """Preprocessing-graph throughput (BASELINE.json config 1): full
    mHuBERT-base forward (conv extractor + 11 transformer layers) fused
    with K=1000 k-means matmul-argmin in ONE jitted program — the
    feature-dump + quantize stage (scripts/prepare). bf16 compute, one
    chip. Run with `python bench.py --prepare`."""
    import os

    from diffnorm_tpu.models.hubert import HubertEncoder
    from diffnorm_tpu.models.kmeans import kmeans_predict

    b = int(os.environ.get("BENCH_BATCH", 8))
    secs = int(os.environ.get("BENCH_SECS", 10))
    REPEATS = int(os.environ.get("BENCH_REPEATS", 4))
    t = 16000 * secs
    model = HubertEncoder(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(b, t)) * 0.1, jnp.float32)
    variables = jax.jit(
        lambda w: model.init(jax.random.PRNGKey(0), w, output_layer=11)
    )(wav[:1])
    cent = jnp.asarray(rng.normal(size=(1000, 768)), jnp.float32)

    @jax.jit
    def run_many(v, w, c):
        def body(carry, i):
            feats = model.apply(
                v, w + (i * 1e-6), output_layer=11).astype(jnp.float32)
            units = kmeans_predict(feats.reshape(-1, feats.shape[-1]), c)
            return carry + jnp.sum(units), ()

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                jnp.arange(REPEATS))
        return total

    _ = int(run_many(variables, wav, cent))  # compile + run
    tiny = jax.jit(lambda x: jnp.sum(x))
    _ = float(tiny(jnp.ones((8,))))
    t0 = time.perf_counter()
    _ = float(tiny(jnp.ones((8,))))
    latency = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = int(run_many(variables, wav, cent))
    wall = max(time.perf_counter() - t0 - latency, 1e-9)
    rtf = REPEATS * b * secs / wall
    mfu = _mfu_pct(run_many, (variables, wav, cent), wall / REPEATS,
                   repeats=1)  # scan body counted once by cost analysis
    print(json.dumps({
        "metric": "hubert_kmeans_prepare_rtf",
        "value": round(rtf, 1),
        "unit": f"audio_s/wall_s (B{b}x{secs}s, mHuBERT layer-11 + K=1000 "
                "fused, bf16, 1 chip)",
        "vs_baseline": round(rtf / 5.0, 2),
        "mfu_pct": mfu,
    }))


def main_nar_train():
    """NAR S2UT translator train-step throughput (stage-3 workload,
    scripts/s2ut/train.sh: full-size nar_s2ut_conformer, 400k updates at
    40k max-tokens — the costliest recipe). fwd+bwd+adam per step, bf16
    compute, f32 params. Run with `python bench.py --nar-train`;
    BENCH_BATCH / BENCH_SEQ (source fbank frames) override shapes."""
    import os

    from diffnorm_tpu.config import Config, make_trainer_config
    from diffnorm_tpu.registry import TASKS, _import_all
    from diffnorm_tpu.train.trainer import Trainer

    _import_all()
    # default = the recipe-shape knee: scripts/s2ut/train.sh runs 40k
    # max-tokens ~= B96 at 4.8 s; the published number should be the shape
    # the recipe actually trains at (VERDICT r3), not the B32 warm-up shape
    b = int(os.environ.get("BENCH_BATCH", 96))
    seq = int(os.environ.get("BENCH_SEQ", 480))  # 4.8 s utterances
    # default rbg: dropout-mask generation through the TPU's hardware RNG.
    # An xplane profile showed threefry mask fusions are 61% of the step's
    # device time at B96; rbg is +37% step throughput (PERFORMANCE.md).
    # BENCH_PRNG=threefry restores the software PRNG.
    if os.environ.get("BENCH_PRNG", "rbg") == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")
    cfg = Config(
        arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
        target_code_size=1000, label_smoothing=0.2, dtype="bfloat16",
        lr=5e-4, warmup_updates=10, fused_train_step=_fused_flag(),
    )
    if int(os.environ.get("BENCH_REMAT", "0")):
        cfg.encoder_remat = True
    task = TASKS.get("dummy_nar").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    trainer = Trainer(make_trainer_config(cfg), task, model, crit)
    batch = task.dummy_batch(b, seq)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    ups, _state, mfu = _measure_train_ups(trainer, state, batch)
    print(json.dumps({
        "metric": "nar_s2ut_train_step_throughput",
        "value": round(ups * b * seq, 1),
        "unit": f"src_frames/s (B{b}xT{seq} fwd+bwd+adam, bf16, 1 chip)",
        "vs_baseline": round(ups, 3),
        "mfu_pct": mfu,
    }))


def _pretrain_train_bench(family: str):
    """Self-supervised pretraining train-step throughput (fwd+bwd+adam,
    bf16 compute, rbg dropout RNG like the other train benches).

    family='hubert': base-size masked-unit prediction (hubert.py recipe:
    12 layers/768d, K=504 targets). family='wav2vec2': base-size
    contrastive (gumbel VQ + 100 negatives,
    wav2vec2_base_librispeech.yaml). Reports audio seconds consumed per
    wall second. BENCH_BATCH / BENCH_SEQ (waveform samples) override
    shapes (default 8 x 10 s)."""
    import os

    from diffnorm_tpu.config import Config, make_trainer_config
    from diffnorm_tpu.registry import TASKS, _import_all
    from diffnorm_tpu.train.trainer import Trainer

    _import_all()
    # B16x10s = 2.8M samples/step: the reference recipe is 1.4M max_tokens
    # PER GPU x 32 GPUs (hubert_base_librispeech.yaml) — a chip batching
    # two GPUs' worth (global batch preserved via update_freq) amortizes
    # the dispatch-diluted step: 17.6% MFU at B8 -> 21.6% at B16 (r5 sweep)
    b = int(os.environ.get("BENCH_BATCH", 16))
    seq = int(os.environ.get("BENCH_SEQ", 160_000))  # 10 s at 16 kHz
    if os.environ.get("BENCH_PRNG", "rbg") == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")
    if family == "hubert":
        cfg = Config(arch="hubert", criterion="hubert",
                     target_code_size=500, dtype="bfloat16",
                     lr=5e-4, warmup_updates=10)
        task = TASKS.get("dummy_hubert").setup_task(cfg)
    else:
        cfg = Config(arch="wav2vec2", criterion="wav2vec",
                     dtype="bfloat16", lr=5e-4, warmup_updates=10)
        task = TASKS.get("dummy_wav2vec2").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    trainer = Trainer(make_trainer_config(cfg), task, model, crit)
    batch = task.dummy_batch(b, seq)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    ups, _state, mfu = _measure_train_ups(trainer, state, batch)
    audio_s = b * seq / 16_000.0
    print(json.dumps({
        "metric": f"{family}_pretrain_step_throughput",
        "value": round(ups * audio_s, 2),
        "unit": f"audio_s/s (B{b}x{seq / 16000:.0f}s fwd+bwd+adam, "
                f"base size, bf16, 1 chip)",
        "vs_baseline": round(ups, 3),
        "mfu_pct": mfu,
    }))


def main_vocoder():
    """Vocoder metric: code-HiFi-GAN unit->waveform synthesis RTF on one
    chip (the serving-path wall-clock dominator after the NAR translator).
    Full released config: 128-d unit embedding, 512 initial channels,
    x320 upsample (5*4*4*2*2), 3 MRF resblocks per stage. Run with
    `python bench.py --vocoder`."""
    import os

    from diffnorm_tpu.models.hifigan import CodeGenerator

    b = int(os.environ.get("BENCH_BATCH", 8))
    t = int(os.environ.get("BENCH_SEQ", 240))  # 4.8 s at 50 Hz units
    dtype = jnp.bfloat16
    module = CodeGenerator(num_embeddings=1000, embedding_dim=128,
                           dtype=dtype)
    code = jnp.asarray(
        np.random.default_rng(0).integers(0, 1000, size=(b, t)), jnp.int32
    )
    variables = module.init(jax.random.PRNGKey(0), code)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, variables
    )

    # DIFFNORM_INT8_VOCODER=1 + BENCH_INT8_STATIC=1: calibrate the packed
    # convs' activation scales (the dynamic max-abs pass made int8 a 7%
    # loss here; static scales remove it — PERFORMANCE.md)
    if (os.environ.get("DIFFNORM_INT8_VOCODER", "0") == "1"
            and os.environ.get("BENCH_INT8_STATIC", "1") == "1"):
        from diffnorm_tpu.ops.quant import calibrate_apply

        variables = calibrate_apply(module.apply, variables, code)
        os.environ["DIFFNORM_INT8_STATIC"] = "1"

    REPEATS = 8

    def run_many(v, c):
        def body(carry, i):
            # codes must depend on the loop index or XLA hoists the whole
            # (loop-invariant) vocoder call out of the scan
            wav = module.apply(v, (c + i) % 1000)
            return carry + jnp.sum(wav[:, ::1024].astype(jnp.float32)), ()
        total, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(REPEATS))
        return total

    fn = jax.jit(run_many)
    _ = float(fn(variables, code))  # compile

    tiny = jax.jit(lambda x: jnp.sum(x))
    _ = float(tiny(jnp.ones((8,))))
    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(tiny(jnp.ones((8,))))
        lat.append(time.perf_counter() - t0)
    latency = min(lat)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(fn(variables, code))
        times.append(time.perf_counter() - t0)
    wall = max(min(times) - latency, 1e-9) / REPEATS
    audio_seconds = b * t * 320 / 16000.0
    rtf = audio_seconds / wall
    # the REPEATS scan body is counted once by cost analysis -> repeats=1
    mfu = _mfu_pct(fn, (variables, code), wall, repeats=1)
    print(json.dumps({
        "metric": "codehifigan_vocoder_rtf",
        "value": round(rtf, 3),
        "unit": f"audio_s/wall_s (B{b}xT{t} units, x320 upsample, bf16, "
                "1 chip)",
        "vs_baseline": round(rtf / 5.0, 3),
        "mfu_pct": mfu,
    }))


def main_e2e():
    """End-to-end S2ST serving RTF (the BASELINE north-star): fbank ->
    full-size nar_s2ut_conformer mask-predict (15 iters) -> unit dedup ->
    duration-predicted expansion -> full-size code-HiFi-GAN waveform, all
    ONE jitted program (generate/s2st.py). RTF = input speech seconds per
    wall second on one chip. Run with `python bench.py --e2e`."""
    import os

    from diffnorm_tpu.config import Config
    from diffnorm_tpu.generate.s2st import s2st_generate
    from diffnorm_tpu.models.hifigan import CodeGenerator
    from diffnorm_tpu.registry import TASKS, _import_all

    _import_all()
    b = int(os.environ.get("BENCH_BATCH", 16))
    frames = int(os.environ.get("BENCH_SEQ", 480))  # 4.8 s at 10 ms shift
    # Static-int8 NAR decode inside the fused chain, default ON
    # (BENCH_E2E_INT8=0 reverts): bf16 889.1 -> int8-static 935.1 RTF
    # (+5.2%); the vocoder stays bf16 (int8 measured -7% there)
    e2e_int8 = os.environ.get("BENCH_E2E_INT8", "1") == "1"
    cfg = Config(
        arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
        target_code_size=1000, label_smoothing=0.2, lr=5e-4,
        dtype="bfloat16", quant_int8=e2e_int8,
    )
    task = TASKS.get("dummy_nar").setup_task(cfg)
    model = task.build_model()
    batch = task.dummy_batch(b, frames)
    nar_vars = task.init_variables(model, jax.random.PRNGKey(0), batch)
    if e2e_int8:
        from diffnorm_tpu.ops.quant import calibrate_apply

        nar_vars = calibrate_apply(
            model.module.apply, nar_vars,
            jnp.asarray(batch["src_tokens"]),
            jnp.asarray(batch["src_lengths"]),
            jnp.asarray(batch["prev_target"]),
            tgt_tokens=jnp.asarray(batch["target"]),
            deterministic=True,
        )
        os.environ["DIFFNORM_INT8_STATIC"] = "1"

    voc = CodeGenerator(num_embeddings=1000, embedding_dim=128,
                        dur_predictor=True, dtype=jnp.bfloat16)
    code0 = jnp.zeros((1, 8), jnp.int32)

    def init_all(m, c):
        out = m(c)
        m.predict_durations(c)
        return out

    voc_vars = voc.init(jax.random.PRNGKey(1), code0, method=init_all)
    to_bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    nar_vars, voc_vars = to_bf16(nar_vars), to_bf16(voc_vars)
    # opt-in int8 vocoder inside the chain: calibrate its packed-conv
    # activation scales too, or the static flag silently leaves it on the
    # dynamic max-abs path (the measured 7% loss)
    if (os.environ.get("DIFFNORM_INT8_VOCODER", "0") == "1"
            and os.environ.get("BENCH_INT8_STATIC", "1") == "1"):
        from diffnorm_tpu.ops.quant import calibrate_apply

        voc_vars = calibrate_apply(
            voc.apply, voc_vars,
            jnp.asarray(np.random.default_rng(2).integers(
                0, 1000, size=(4, 64)), jnp.int32))
        os.environ["DIFFNORM_INT8_STATIC"] = "1"

    # static waveform canvas: 384 units = 7.7 s of output audio per 4.8 s
    # input (CVSS target durations are ~input-length); the full worst case
    # (max_len*max_duration = 1024) pays 4x vocoder FLOPs on padding
    wav_units = int(os.environ.get("BENCH_WAV_UNITS", 384))

    E2E_REPEATS = 8

    def run(nv, vv, s, l):
        """E2E_REPEATS full serving chains inside one jitted program (the
        input perturbation depends on the loop index so XLA cannot hoist
        the loop-invariant chain; single ~100 ms calls are too close to the
        tunnel's latency jitter to time reliably)."""
        def body(carry, i):
            tot, steps, maxs = carry
            si = s + (i.astype(s.dtype) * 1e-6)
            wav, wav_lengths, _, _, n_steps = s2st_generate(
                model, nv, voc, vv, si, l, max_iter=15, max_len=256,
                max_duration=4, max_wav_units=wav_units,
                vocoder_chunk=int(os.environ.get("BENCH_VOC_CHUNK", 4)),
                return_steps=True,
            )
            n_steps = n_steps.astype(jnp.int32)
            tot = tot + jnp.sum(
                wav[:, ::1024].astype(jnp.float32)) + jnp.sum(wav_lengths)
            return (tot, steps + jnp.sum(n_steps),
                    maxs + jnp.max(n_steps)), ()
        (total, steps, maxs), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32),
                   jnp.zeros((), jnp.int32)),
            jnp.arange(E2E_REPEATS)
        )
        return total, steps, maxs

    fn = jax.jit(run)
    src = jnp.asarray(batch["src_tokens"])
    lens = jnp.asarray(batch["src_lengths"])
    _, steps_dev, maxs_dev = fn(nar_vars, voc_vars, src, lens)  # compile
    mean_steps = float(steps_dev) / (b * E2E_REPEATS)
    max_steps = float(maxs_dev) / E2E_REPEATS

    tiny = jax.jit(lambda x: jnp.sum(x))
    _ = float(tiny(jnp.ones((8,))))
    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(tiny(jnp.ones((8,))))
        lat.append(time.perf_counter() - t0)
    latency = min(lat)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out_dev, _s, _m = fn(nar_vars, voc_vars, src, lens)
        _ = float(out_dev)
        times.append(time.perf_counter() - t0)
    wall = max(min(times) - latency, 1e-9)
    audio_seconds = b * frames * 0.01 * E2E_REPEATS  # 10 ms fbank shift
    rtf = audio_seconds / wall
    # analytic MFU per chain: NAR encode + the decode passes actually
    # executed (param model; the iteration loop hides its body from cost
    # analysis; the adaptive exit runs max-over-rows+1 passes, advisor r4)
    # + one loop-free vocoder program costed by XLA (duration-expanded
    # length wav_units)
    mfu = None
    try:
        p = nar_vars["params"]
        t_enc = frames // 4
        nar_flops = _param_flops(p["encoder"], b, t_enc,
                                 attn_layers=16, attn_dim=256)
        dflops = _param_flops(p["decoder"], b, 256, attn_layers=6,
                              attn_dim=256)
        dflops += 6 * 4.0 * b * 256 * t_enc * 256  # cross-attention
        nar_flops += max(max_steps + 1.0, 1.0) * dflops
        voc_fn = jax.jit(lambda v, c: voc.apply(v, c))
        codes_probe = jnp.zeros((b, wav_units), jnp.int32)
        ca = voc_fn.lower(voc_vars, codes_probe).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        voc_flops = float(ca.get("flops", 0.0))
        mfu = _mfu_from_flops(nar_flops + voc_flops, wall / E2E_REPEATS,
                              int8=False)
    except Exception:
        pass
    print(json.dumps({
        "metric": "s2st_e2e_rtf",
        "value": round(rtf, 3),
        "unit": f"input_audio_s/wall_s (B{b}x{frames} fbank frames, "
                "adaptive-exit decode <=15 iters + dur-expanded HiFi-GAN, "
                f"one jitted program, {'int8-static decode + bf16 vocoder' if e2e_int8 else 'bf16'}, "
                "1 chip)",
        "vs_baseline": round(rtf / 5.0, 3),
        "mfu_pct": mfu,
        "mean_steps": round(mean_steps, 2),
        "max_steps": round(max_steps, 2),
    }))


def main_gan_train():
    """GAN vocoder fine-tune D+G step throughput (the reference's HiFi-GAN
    training loop, research/TranSpeech/hifigan/models.py:128-283 + train.py):
    full released generator (512 initial channels, x320 upsample), full MPD
    (periods 2/3/5/7/11) + MSD (3 scales) discriminators, 8960-sample
    training segments (28 units). Reports audio-seconds trained per wall
    second for the combined D+G update. Run with `python bench.py
    --gan-train`; BENCH_BATCH sweeps the waveform-rate batch knee."""
    import os

    from diffnorm_tpu.config import Config
    from diffnorm_tpu.models.hifigan import CodeGenerator
    from diffnorm_tpu.train.gan_trainer import GanTrainer

    b = int(os.environ.get("BENCH_BATCH", 16))
    seg = 8960  # reference vocoder fine-tune segment (28 units x 320)
    t_code = seg // 320
    # BENCH_GAN_BF16=1: bfloat16 generator+discriminator compute (params
    # f32, losses reduce in f32) — the waveform-rate convs are
    # bandwidth-bound, so halving activation bytes is the lever
    gan_bf16 = os.environ.get("BENCH_GAN_BF16", "1") == "1"
    gen = CodeGenerator(num_embeddings=1000, embedding_dim=128,
                        dur_predictor=True,
                        dtype=jnp.bfloat16 if gan_bf16 else jnp.float32)
    cfg = Config(lr=2e-4, bf16_disc=gan_bf16)
    trainer = GanTrainer(gen, cfg)
    rng = np.random.default_rng(0)
    batch = {
        "code": rng.integers(0, 1000, size=(b, t_code)).astype(np.int32),
        "wav": (rng.normal(size=(b, seg)) * 0.1).astype(np.float32),
        "durations": np.ones((b, t_code), np.int32),
    }
    state = trainer.init_state(
        jax.random.PRNGKey(0), jnp.asarray(batch["code"][:1]),
        jnp.asarray(batch["wav"][:1]),
    )

    import sys

    code = jnp.asarray(batch["code"])
    wav = jnp.asarray(batch["wav"])
    durs = jnp.asarray(batch["durations"])
    t0 = time.perf_counter()
    state, d_loss = trainer._d_step(state, code, wav)
    _ = float(d_loss)
    t_d = time.perf_counter() - t0
    print(f"# d_step compiled in {t_d:.0f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    state, g_loss, _aux = trainer._g_step(state, code, wav, durs)
    _ = float(g_loss)
    t_g = time.perf_counter() - t0
    print(f"# g_step compiled in {t_g:.0f}s", file=sys.stderr, flush=True)
    compile_s = t_d + t_g

    times = []
    for _ in range(5):
        t1 = time.perf_counter()
        state, mets = trainer.train_step(state, batch)
        times.append(time.perf_counter() - t1)
    step_s = min(times)
    audio_per_step = b * seg / 16000.0
    mfu = None
    try:
        def _fl(compiled):
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            return float(ca.get("flops", 0.0))

        fl = _fl(trainer._d_step.lower(state, code, wav).compile())
        fl += _fl(trainer._g_step.lower(state, code, wav, durs).compile())
        mfu = _mfu_from_flops(fl, step_s)
    except Exception:
        pass
    print(json.dumps({
        "metric": "gan_vocoder_train_throughput",
        "value": round(audio_per_step / step_s, 3),
        "unit": f"audio_s/wall_s (B{b}x{seg} samples, D+G update, "
                f"full MPD+MSD, {'bf16' if gan_bf16 else 'f32'} compute, "
                f"1 chip; step {step_s*1e3:.0f} ms, "
                f"compile {compile_s:.0f} s)",
        "vs_baseline": round(audio_per_step / step_s / 5.0, 3),
        "mfu_pct": mfu,
    }))


if __name__ == "__main__":
    import sys

    if "--vae-train" in sys.argv:
        main_vae_train()
    elif "--prepare" in sys.argv:
        main_prepare()
    elif "--nar-train" in sys.argv:
        main_nar_train()
    elif "--nar-trained" in sys.argv:
        main_nar_trained()
    elif "--nar" in sys.argv:
        main_nar()
    elif "--train" in sys.argv:
        main_train()
    elif "--vocoder" in sys.argv:
        main_vocoder()
    elif "--e2e" in sys.argv:
        main_e2e()
    elif "--gan-train" in sys.argv:
        main_gan_train()
    elif "--hubert-train" in sys.argv:
        _pretrain_train_bench("hubert")
    elif "--w2v-train" in sys.argv:
        _pretrain_train_bench("wav2vec2")
    else:
        main()
