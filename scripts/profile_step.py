"""Profile one bench family's train step on the attached chip and bucket
device-plane op self-times from the written xplane.pb.

    python scripts/profile_step.py --family vae [--steps 3]

Families mirror bench.py's train benches (same shapes/flags), so a bucket
table here explains that bench's mfu_pct row in PERFORMANCE.md.

The xplane.pb is parsed with a self-contained protobuf wire-format reader
(no tensorflow in the image; the tensorboard profile plugin's bundled
protos are version-broken here) against the stable public field numbers of
tensorflow/core/profiler/protobuf/xplane.proto:

  XSpace.planes=1; XPlane{name=2, lines=3, event_metadata=4(map)};
  XLine{name=2, events=4}; XEvent{metadata_id=1, duration_ps=3};
  XEventMetadata{id=1, name=2}.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---------------------------------------------------------------- wire fmt


def _read_varint(buf, i):
    shift = result = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fnum, wtype = key >> 3, key & 7
        if wtype == 0:
            val, i = _read_varint(buf, i)
        elif wtype == 1:
            val, i = buf[i:i + 8], i + 8
        elif wtype == 2:
            ln, i = _read_varint(buf, i)
            val, i = buf[i:i + ln], i + ln
        elif wtype == 5:
            val, i = buf[i:i + 4], i + 4
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        yield fnum, wtype, val


def parse_xplane(path):
    """-> {plane_name: {event_name: total_duration_ps}}"""
    with open(path, "rb") as f:
        space = f.read()
    planes = {}
    for fnum, _, val in _fields(space):
        if fnum != 1:
            continue
        name, lines, meta = "", [], {}
        for pf, _, pv in _fields(val):
            if pf == 2:
                name = pv.decode("utf-8", "replace")
            elif pf == 3:
                lines.append(pv)
            elif pf == 4:  # map<int64, XEventMetadata> entry {key=1, value=2}
                k = v = None
                for mf, _, mv in _fields(pv):
                    if mf == 1:
                        k = mv
                    elif mf == 2:
                        v = mv
                if v is not None:
                    mname = ""
                    for ef, _, ev in _fields(v):
                        if ef == 2:
                            mname = ev.decode("utf-8", "replace")
                    meta[k] = mname
        by_line = {}
        for line in lines:
            lname = ""
            durs = collections.defaultdict(int)
            for lf, wt0, lv in _fields(line):
                if lf == 2 and wt0 == 2:
                    lname = lv.decode("utf-8", "replace")
                if lf != 4:
                    continue
                mid = dur = 0
                for ef, wt, ev in _fields(lv):
                    if ef == 1 and wt == 0:
                        mid = ev
                    elif ef == 3 and wt == 0:
                        dur = ev
                durs[meta.get(mid, f"#{mid}")] += dur
            if durs:
                prev = by_line.get(lname, {})
                for k, v in durs.items():
                    prev[k] = prev.get(k, 0) + v
                by_line[lname] = prev
        planes[name] = by_line
    return planes


def _op_kind(name):
    """HLO op kind from the event's lhs: '%fusion.21 = (...' -> 'fusion'.
    (Classifying on the FULL text mis-buckets fusions whose operand text
    mentions transpose/copy.)"""
    m = re.match(r"%?([a-zA-Z_-]+)[.\d]*\s*=", name)
    if m:
        return m.group(1).rstrip("-")
    m = re.match(r"%?([a-zA-Z_-]+)", name)
    return m.group(1) if m else name[:20]


def bucketize(durs):
    out = collections.defaultdict(int)
    for name, d in durs.items():
        kind = _op_kind(name)
        if re.search(r"rng|threefry|philox|rbg", kind, re.I):
            kind = "rng"
        elif kind.startswith(("copy", "transpose", "reshape", "bitcast",
                              "slice", "dynamic-update-slice")):
            kind = "copy/layout"
        elif kind.startswith(("all-reduce", "all-gather", "collective",
                              "reduce-scatter")):
            kind = "collective"
        elif kind.startswith("convolution"):
            kind = "convolution"
        elif kind.startswith("dot"):
            kind = "matmul"
        elif kind.startswith("reduce"):
            kind = "reduce"
        elif kind.startswith("fusion"):
            kind = "fusion"
        out[kind] += d
    return out


# ----------------------------------------------------------------- families


def _family_step(family, b, seq):
    """-> (trainer, state, batch) for one family at bench shapes."""
    import jax

    from diffnorm_tpu.config import Config, make_trainer_config
    from diffnorm_tpu.registry import TASKS, _import_all
    from diffnorm_tpu.train.trainer import Trainer

    _import_all()
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("BENCH_PRNG", "rbg"))
    if family == "vae":
        cfg = Config(arch="speech_vae_decoder",
                     criterion="speech_vae_decoder_loss",
                     feature_dim=768, latent_dim=128, target_code_size=1000,
                     lr=5e-4, dtype="bfloat16")
        task = TASKS.get("dummy_vae").setup_task(cfg)
        batch = task.dummy_batch(b or 16, seq or 256)
    elif family == "diffusion":
        cfg = Config(arch="diff_discrete", criterion="ddpm_discrete_loss",
                     hidden_dim=512, latent_dim=128, feature_dim=768,
                     timesteps=200, target_code_size=1000, lr=1e-4,
                     dtype="bfloat16")
        task = TASKS.get("speech_diffusion_discrete").setup_task(cfg)
        batch = task.dummy_batch(b or 16, seq or 256)
    elif family == "hubert":
        cfg = Config(arch="hubert", criterion="hubert",
                     target_code_size=500, lr=5e-4, dtype="bfloat16")
        task = TASKS.get("dummy_hubert").setup_task(cfg)
        batch = task.dummy_batch(b or 8, seq or 160000)
    elif family == "wav2vec2":
        cfg = Config(arch="wav2vec2", criterion="wav2vec", lr=5e-4,
                     dtype="bfloat16")
        task = TASKS.get("dummy_wav2vec2").setup_task(cfg)
        batch = task.dummy_batch(b or 8, seq or 160000)
    elif family == "nar":
        cfg = Config(arch="nar_s2ut_conformer",
                     criterion="nar_speech_to_unit", target_code_size=1000,
                     label_smoothing=0.2, lr=5e-4, dtype="bfloat16")
        task = TASKS.get("dummy_nar").setup_task(cfg)
        batch = task.dummy_batch(b or 96, seq or 480)
    else:
        raise SystemExit(f"unknown family {family}")
    model = task.build_model()
    crit = task.build_criterion()
    trainer = Trainer(make_trainer_config(cfg), task, model, crit)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    return trainer, state, batch


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--parse", default=None,
                   help="re-analyze an existing xplane.pb (no profiling run)")
    p.add_argument("--family", default=None,
                   choices=["vae", "diffusion", "hubert", "wav2vec2", "nar"])
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--batch", type=int, default=0)
    p.add_argument("--seq", type=int, default=0)
    p.add_argument("--trace-dir", default=None)
    p.add_argument("--top", type=int, default=15)
    args = p.parse_args(argv)

    if args.parse:
        pbs = [args.parse]
    else:
        if not args.family:
            raise SystemExit("--family required unless --parse is given")
        import jax

        from diffnorm_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        trainer, state, batch = _family_step(args.family, args.batch,
                                             args.seq)
        rng = jax.random.PRNGKey(1)
        for i in range(2):  # compile + warm outside the trace
            state, mets = trainer.train_step(state, [batch],
                                             jax.random.fold_in(rng, i))
        _ = float(mets["loss"])

        trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="dn_prof_")
        jax.profiler.start_trace(trace_dir)
        for i in range(args.steps):
            state, mets = trainer.train_step(state, [batch],
                                             jax.random.fold_in(rng, 100 + i))
        _ = float(mets["loss"])
        jax.profiler.stop_trace()

        pbs = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                               recursive=True))
        if not pbs:
            raise SystemExit(f"no xplane.pb under {trace_dir}")
    planes = parse_xplane(pbs[-1])
    # device plane's "XLA Ops" line: per-op self time (the "Steps" and
    # "XLA Modules" lines are whole-step/module spans — summing them
    # double-counts)
    dev, durs = None, None
    for name, by_line in planes.items():
        if ("TPU" in name or "tpu" in name.lower()) and "XLA Ops" in by_line:
            dev, durs = name, by_line["XLA Ops"]
            break
    if durs is None:
        for name, by_line in planes.items():
            if by_line:
                best = max(by_line, key=lambda ln: sum(by_line[ln].values()))
                dev, durs = f"{name}/{best}", by_line[best]
                break
    total = sum(durs.values()) or 1
    print(f"# plane: {dev}  total {total / 1e9 / args.steps:.2f} ms/step "
          f"device time over {args.steps} steps")
    print("\n## buckets")
    for bname, d in sorted(bucketize(durs).items(), key=lambda kv: -kv[1]):
        print(f"{bname:24s} {100.0 * d / total:5.1f}%")
    print(f"\n## top {args.top} events")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{100.0 * d / total:5.1f}%  {d / 1e9 / args.steps:8.3f} ms  "
              f"{name[:90]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
