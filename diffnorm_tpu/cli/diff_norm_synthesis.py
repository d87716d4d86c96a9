"""DiffNorm normalization driver: rewrite unit manifests with
diffusion-normalized units.

Capability parity with research/TranSpeech/diff_norm_synthesis.py: loads a
trained latent-diffusion checkpoint, joins the translation manifest with
per-utterance target feature dumps, re-derives the reduced-frame indices,
runs `ddim_sample` (partial noise at --start-step of T=200), re-reduces the
output units, and writes new `{split}.tsv` manifests that become the S2UT
training targets.

TPU redesign: utterances are grouped into length buckets so the jitted
sampler compiles for a handful of shapes; each bucket batch runs the whole
49-step reverse loop as one program.

  python -m diffnorm_tpu.cli.diff_norm_synthesis $DATA \
      --ckpt ckpt/diffusion/step_002000000 --tgt-feat-dir feat/ \
      --output-dir diff_unit_vae_50 --start-step 50 --batch-size 100
"""

from __future__ import annotations

import logging
import os
import sys
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffnorm_tpu.cli.args import parse_args
from diffnorm_tpu.config import Config
from diffnorm_tpu.data.batching import bucket_length
from diffnorm_tpu.data.manifest import (
    read_feature_manifest,
    read_translation_manifest,
    write_translation_manifest,
)
from diffnorm_tpu.models.diffusion import ddim_sample
from diffnorm_tpu.ops.unit_reduce import reduce_units
from diffnorm_tpu.registry import TASKS, _import_all, import_user_module
from diffnorm_tpu.train.checkpoint import load_checkpoint_params

logger = logging.getLogger("diffnorm_tpu.diff_norm")


def main(cfg: Optional[Config] = None) -> int:
    logging.basicConfig(level=logging.INFO, force=True,
                        format="%(asctime)s | %(levelname)s | %(message)s")
    _import_all()
    if cfg is None:
        cfg = parse_args()
    if cfg.get("cpu"):
        jax.config.update("jax_platforms", "cpu")
    # AFTER the platform pin: a user module that touches jax at import time
    # would otherwise initialize the TPU backend and make --cpu a no-op
    import_user_module(cfg.get("user_dir"))
    from diffnorm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    cfg.setdefault("task", "speech_diffusion_discrete")
    cfg.setdefault("arch", "diff_discrete")
    cfg.setdefault("criterion", "ddpm_discrete_loss")
    task = TASKS.get(cfg["task"]).setup_task(cfg)
    model = task.build_model()

    start_step = cfg.get("start_step", 50)
    # --ddim-stride N: respaced reverse chain (IDDPM space_timesteps
    # semantics); 1 = the reference's exact step-by-step loop. N>1 chains
    # start denoising at t=start_step (the injected noise level) rather
    # than the reference's start_step-1, so they are not a strict
    # subsequence of the stride=1 chain — see ddim_sample's docstring
    stride = int(cfg.get("ddim_stride", 1) or 1)
    batch_size = cfg.get("batch_size", 100)
    out_dir = cfg.get("output_dir")
    os.makedirs(out_dir, exist_ok=True)

    # restore checkpoint (a TrainState dict: params + frozen vae)
    dummy = task.dummy_batch(1, 8)
    variables = task.init_variables(model, jax.random.PRNGKey(0), dummy)
    restored = load_checkpoint_params(cfg["ckpt"])
    if "params" in restored and "frozen_params" in restored:
        params = {**restored["params"], **restored["frozen_params"]}
    else:
        params = restored.get("params", restored)
    variables = {"params": params}
    logger.info("restored diffusion checkpoint from %s", cfg["ckpt"])

    # --quant-int8-static (with --quant-int8): calibrate per-site activation
    # scales on the first REAL feature batch, then sample with static
    # scales — no max-abs reduce inside the 49-step scan (measured RTF
    # 332 -> 372 on v5e, PERFORMANCE.md "Static activation scales"; >95%
    # unit agreement pinned by
    # tests/test_variants.py::test_int8_static_scale_parity)
    want_static = bool(cfg.get("quant_int8") and cfg.get("quant_int8_static"))

    # --data-parallel N: shard each normalization batch over a "data" mesh
    # of N chips (params replicated, GSPMD splits the batch; the reference
    # driver is single-GPU with batch 100 — here the 2M-update corpus
    # normalization job scales over ICI instead)
    dp = int(cfg.get("data_parallel", 0) or 0)
    mesh = None
    if dp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from diffnorm_tpu.parallel.mesh import make_mesh, replicate

        mesh = make_mesh(data=dp, devices=jax.devices()[:dp])
        variables = replicate(variables, mesh)
        feat_sh = NamedSharding(mesh, P("data", None, None))
        mask_sh = NamedSharding(mesh, P("data", None))
        logger.info("data-parallel normalization over %d devices", dp)

    sample_fn = jax.jit(
        lambda v, f, m, r: ddim_sample(model, v, f, m, r,
                                       start_step=start_step, stride=stride),
    )

    rng = jax.random.PRNGKey(cfg.get("seed", 1))
    splits = str(cfg.get("splits", "test,dev,train")).split(",")
    for split in splits:
        manifest_path = os.path.join(cfg.get("data"), f"{split}.tsv")
        if not os.path.exists(manifest_path):
            logger.warning("skipping %s (no %s)", split, manifest_path)
            continue
        rows = read_translation_manifest(manifest_path)
        feats = read_feature_manifest(
            os.path.join(cfg["tgt_feat_dir"], f"{split}.manifest.tsv")
        )
        # sort by reduced length, bucket for few jit shapes
        items = []
        for row in rows:
            if row["id"] not in feats:
                continue
            full_units = np.asarray(
                [int(x) for x in row["tgt_audio"].split()], np.int64
            )
            dedup, _, keep = reduce_units(full_units)
            items.append((row, feats[row["id"]][0], dedup, keep))
        items.sort(key=lambda it: len(it[2]))

        out_rows, n_match, n_total = [], 0, 0
        t0 = time.time()

        def make_batch(start):
            """Host side of one chunk: .npy loads + padding. Runs on a
            background thread one chunk ahead so file IO overlaps the
            previous chunk's DDIM scan. Host work ONLY — jax calls from a
            worker thread can deadlock an in-flight XLA:CPU compile on the
            main thread (observed: backend_compile hung forever)."""
            chunk = items[start:start + batch_size]
            max_len = bucket_length(max(len(c[2]) for c in chunk))
            bsz = len(chunk)
            # pad the row count to a multiple of the data-parallel degree so
            # GSPMD can split the batch evenly; pad rows get one valid frame
            # (an all-invalid mask row would softmax over nothing) and are
            # dropped in consume()
            rows = bsz + ((-bsz) % dp if dp > 1 else 0)
            feat_dim = cfg.get("feature_dim", 768)
            feat_batch = np.zeros((rows, max_len, feat_dim), np.float32)
            mask = np.zeros((rows, max_len), bool)
            mask[bsz:, 0] = True
            for j, (_, fpath, dedup, keep) in enumerate(chunk):
                f = np.load(fpath)[keep]
                feat_batch[j, : len(dedup)] = f
                mask[j, : len(dedup)] = True
            return chunk, feat_batch, mask

        def consume(chunk, units):
            units = np.asarray(units)  # blocks until the device is done
            for j, (row, _, dedup, _) in enumerate(chunk):
                pred = units[j, : len(dedup)]
                nonlocal_counts[0] += int((pred == dedup).sum())
                nonlocal_counts[1] += len(dedup)
                norm_units, _, _ = reduce_units(pred)
                new_row = dict(row)
                new_row["tgt_audio"] = " ".join(
                    str(int(u)) for u in norm_units
                )
                new_row["tgt_n_frames"] = len(norm_units)
                out_rows.append(new_row)

        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        nonlocal_counts = [0, 0]
        starts = list(range(0, len(items), batch_size))
        # pipeline: worker thread loads chunk k+1's files while the device
        # runs chunk k; uploads (async device_put) and sampling dispatch
        # stay on the main thread; results are pulled one chunk behind so
        # the dispatch of chunk k+1 precedes the blocking pull of chunk k
        pending = None
        with ThreadPoolExecutor(max_workers=1) as ex:
            futs = deque(ex.submit(make_batch, s) for s in starts[:2])
            ptr = len(futs)
            while futs:
                chunk, feat_np, mask_np = futs.popleft().result()
                if ptr < len(starts):
                    futs.append(ex.submit(make_batch, starts[ptr]))
                    ptr += 1
                if want_static and "quant_stats" not in variables:
                    from diffnorm_tpu.models.diffusion import (
                        calibrate_act_scales,
                    )

                    variables = calibrate_act_scales(
                        model, variables, jnp.asarray(feat_np),
                        jnp.asarray(mask_np), jax.random.PRNGKey(5),
                        start_step=start_step,
                    )
                    if mesh is not None:
                        from diffnorm_tpu.parallel.mesh import replicate

                        variables = replicate(variables, mesh)
                    os.environ["DIFFNORM_INT8_STATIC"] = "1"
                    logger.info(
                        "calibrated static int8 activation scales on the "
                        "first batch (%d sites)", len(
                            jax.tree_util.tree_leaves(
                                variables["quant_stats"])))
                if mesh is not None:
                    feat_dev = jax.device_put(feat_np, feat_sh)
                    mask_dev = jax.device_put(mask_np, mask_sh)
                else:
                    feat_dev = jax.device_put(feat_np)
                    mask_dev = jax.device_put(mask_np)
                rng, r = jax.random.split(rng)
                units, _ = sample_fn(variables, feat_dev, mask_dev, r)
                if pending is not None:
                    consume(*pending)
                pending = (chunk, units)
            if pending is not None:
                consume(*pending)
        n_match, n_total = nonlocal_counts
        acc = n_match / max(n_total, 1)
        logger.info(
            "%s: normalized %d utts in %.1fs (unit acc vs orig %.3f)",
            split, len(out_rows), time.time() - t0, acc,
        )
        write_translation_manifest(os.path.join(out_dir, f"{split}.tsv"), out_rows)
    return 0


if __name__ == "__main__":
    sys.exit(main())
