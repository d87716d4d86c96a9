"""fairseq-hydra-train entry point (reference fairseq_cli/hydra_train.py).

The hydra config tree maps onto this framework's YAML defaults: pass the
config with `--config cfg.yaml` (cli/args.py merges it under explicit
flags) or hydra-style `key=value` overrides, which this shim rewrites to
`--key value` before delegating to the standard train main.
"""

from __future__ import annotations

import sys
from typing import Optional

from diffnorm_tpu.config import Config


def main(cfg: Optional[Config] = None) -> int:
    from diffnorm_tpu.cli import train

    if cfg is None:
        argv = []
        for a in sys.argv[1:]:
            # hydra-style dotted overrides: task.data=/x -> --data /x,
            # optimization.lr=[5e-4] -> --lr 5e-4
            if "=" in a and not a.startswith("-"):
                key, val = a.split("=", 1)
                key = key.split(".")[-1].replace("-", "_")
                val = val.strip("[]")
                argv += [f"--{key.replace('_', '-')}", val]
            else:
                argv.append(a)
        sys.argv = [sys.argv[0]] + argv
        return train.main()
    return train.main(cfg)


if __name__ == "__main__":
    sys.exit(main())
