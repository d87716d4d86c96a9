"""CLI argument handling: a flat `--key value` surface over Config.

Replaces the reference's argparse/hydra bridge (fairseq/options.py,
fairseq/dataclass/utils.py) with type-inferring parsing: `--lr 5e-4` ->
cfg.lr = 5e-4, `--share-decoder-input-output-embed` -> True, dashes become
underscores. The recipe scripts keep the same flag names as the reference
shell recipes (scripts/{vae,diffusion,s2ut}/train.sh).
"""

from __future__ import annotations

import sys
from typing import List, Optional

from diffnorm_tpu.config import Config


def _infer(value: str):
    if value.lower() in ("true", "false"):
        return value.lower() == "true"
    for cast in (int, float):
        try:
            return cast(value)
        except ValueError:
            continue
    if value[:1] in "[{(":
        import json

        try:
            return json.loads(value.replace("(", "[").replace(")", "]"))
        except json.JSONDecodeError:
            pass
    return value


def parse_args(argv: Optional[List[str]] = None) -> Config:
    """Parse `--key value` flags (+ positional data dir). `--config FILE`
    loads a YAML of defaults first; explicit flags override it (the
    hydra_train capability of the reference, minus hydra)."""
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = Config()
    overrides = Config()
    positional = []
    i = 0
    while i < len(argv):
        tok = argv[i]
        if tok.startswith("--"):
            key = tok[2:].replace("-", "_")
            if i + 1 < len(argv) and not argv[i + 1].startswith("--"):
                value = _infer(argv[i + 1])
                i += 2
            else:
                value = True  # boolean flag
                i += 1
            if key == "config":
                cfg.update(Config.from_yaml(value).to_dict())
            else:
                overrides[key] = value
        else:
            positional.append(tok)
            i += 1
    cfg.update(overrides.to_dict())
    if positional:
        cfg.data = positional[0]
        if len(positional) > 1:
            cfg.extra_positional = positional[1:]
    return cfg
