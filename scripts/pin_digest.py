#!/usr/bin/env python
"""Generate the canonical proof digest of a config on the CPU backend.

The printed value is what bench.py's CONFORMANCE_PIN should carry for
that (n, l): the default bench path digests the flagship prove it just
ran on real hardware and compares against this CPU-generated pin
(benchlib.proof_digest canonicalizes G1 points first, so the comparison
is value-exact and MSM-backend-independent).

Usage: python scripts/pin_digest.py [--n 16] [--l 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--l", type=int, default=8)
    args = ap.parse_args()

    import os

    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("SCZK_SRS_CACHE", str(REPO / ".jax_cache" / "srs"))

    from scalable_collaborative_zksnark_tpu.hyperplonk import (
        packed_proving_parameters,
    )
    from scalable_collaborative_zksnark_tpu.hyperplonk.collaborative import (
        dhyperplonk_phased,
    )
    from scalable_collaborative_zksnark_tpu.mpc.net import PartyNet
    from scalable_collaborative_zksnark_tpu.utils.benchlib import proof_digest

    t0 = time.time()
    net = PartyNet(8 * args.l, mode="leader")
    pk = packed_proving_parameters(args.n, args.l, net)
    out = dhyperplonk_phased(args.n, pk, net)
    d = proof_digest(out)
    print(f"# {time.time() - t0:.1f}s", file=sys.stderr)
    print(f"({args.n}, {args.l}): 0x{d:016X}")


if __name__ == "__main__":
    main()
