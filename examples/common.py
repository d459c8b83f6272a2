"""Shared CLI plumbing for the example/benchmark entry points.

Mirrors the reference's example conventions (clap `--l --n` flags plus
cargo-feature execution modes, /root/reference/README.md:28-33):

* ``--mode sim``    — all N parties computed on-device as a batch axis
  (the `local`/`local-multi-thread` modes; results are real).
* ``--mode leader`` — one party materialized + analytic comm accounting
  (the `leader` mode's fake network).
* ``--cpu``         — force the CPU backend (virtual 8-device host).
"""

from __future__ import annotations

import argparse
import time


def base_parser(description: str) -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=description)
    ap.add_argument("--l", type=int, default=2, help="packing factor (N = 8l)")
    ap.add_argument("--n", type=int, default=8, help="log2 problem size")
    ap.add_argument("--mode", choices=("sim", "leader"), default="leader")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--trace", action="store_true", help="print timer trace")
    return ap


def setup(args):
    if args.cpu:
        import os

        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")
    from scalable_collaborative_zksnark_tpu.utils import timer

    timer.enable(args.trace)


class Timer:
    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *a):
        self.dt = time.time() - self.t0
