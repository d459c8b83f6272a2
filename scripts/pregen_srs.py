#!/usr/bin/env python
"""Pre-generate the seeded benchmark SRS for a config into the disk cache.

On the remote-TPU tunnel, the one-shot SRS generation at n >= 22 builds
a ~4M-point normalize graph whose XLA compile exceeds the remote
compile-helper's memory budget (observed: `tpu_compile_helper subprocess
exit signal SIGKILL`).  The SRS contract is seeded numpy values only
(params.py: srs cache), so generating it once on the CPU backend into
``SCZK_SRS_CACHE`` is exact — the TPU bench then cache-hits straight
past the failing compile.

    python scripts/pregen_srs.py --n 22 --l 8
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=22)
    ap.add_argument("--l", type=int, default=8)
    args = ap.parse_args()

    root = Path(__file__).resolve().parent.parent
    os.environ.setdefault("SCZK_SRS_CACHE", str(root / ".jax_cache" / "srs"))
    import jax

    jax.config.update("jax_platforms", "cpu")

    from scalable_collaborative_zksnark_tpu.hyperplonk import (
        packed_proving_parameters,
    )
    from scalable_collaborative_zksnark_tpu.mpc.net import PartyNet

    t0 = time.time()
    net = PartyNet(8 * args.l, mode="leader")
    pk = packed_proving_parameters(args.n, args.l, net)
    jax.block_until_ready(pk.V)
    print(f"SRS cached for n={args.n}, l={args.l} in {time.time() - t0:.1f}s "
          f"-> {os.environ['SCZK_SRS_CACHE']}")


if __name__ == "__main__":
    main()
