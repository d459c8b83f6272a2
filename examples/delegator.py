#!/usr/bin/env python
"""Share delegation to disk (parity: dist-primitive/examples/delegator.rs).

The reference's only persistence subsystem (delegator.rs:71-109): a
delegator packs a witness into PSS shares and writes one file per
worker (`worker_{i}`); workers read their file back.  Here shares are
stored as .npy limb arrays plus a JSON manifest.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from examples.common import base_parser, setup  # noqa: E402


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--out", default="/tmp/sczk_shares", help="output dir")
    args = ap.parse_args()
    setup(args)
    import jax

    from scalable_collaborative_zksnark_tpu.fields.fr import get_field
    from scalable_collaborative_zksnark_tpu.primitives.mle import pack_vec, unpack_vec
    from scalable_collaborative_zksnark_tpu.pss.pss import PackedSharingParams

    F = get_field("bls12_381_fr")
    pp = PackedSharingParams(F, args.l)
    m = 1 << args.n

    witness = F.random((m,), 42)
    shares = pack_vec(pp, witness)  # [N, m/l, L]

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for i in range(pp.n):
        np.save(out / f"worker_{i}.npy", np.asarray(jax.device_get(shares[i])))
    (out / "manifest.json").write_text(
        json.dumps({"field": F.spec.name, "l": args.l, "n": args.n,
                    "parties": pp.n, "form": "montgomery-u32-limbs"})
    )
    print(f"wrote {pp.n} share files to {out}")

    # read-back check (the worker side of delegator.rs)
    back = jax.numpy.stack(
        [jax.numpy.asarray(np.load(out / f"worker_{i}.npy")) for i in range(pp.n)]
    )
    rec = unpack_vec(pp, back)
    ok = bool(jax.numpy.all(rec == witness))
    print(f"read-back reconstruction: {'OK' if ok else 'MISMATCH'}")


if __name__ == "__main__":
    main()
