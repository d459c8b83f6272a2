"""Shared benchmark-harness helpers (bench.py, scripts/sweep.py).

Two facts of the remote-TPU (axon tunnel) execution environment shape
every timing loop in this repo:

* ``jax.block_until_ready`` returns before device completion over the
  tunnel — a jitted checksum that consumes every output leaf plus a
  ``device_get`` of the scalar is the only reliable barrier.
* Executables are (de)serialized across the tunnel; jax's persistent
  compilation cache turns the multi-minute cold compile of the prover
  phases into a per-process deserialize (the axon interposer stages
  cache entries natively).  XLA:CPU entries are CPU-feature-specific
  and unsafe to share, so the cache stays off on the CPU backend.
"""

from __future__ import annotations

import functools
import os
import socket
import sys
import time
from pathlib import Path

# The axon client dials a host-forwarded relay; if the HOST-side relay is
# down, the first backend touch (jax.devices / default_backend) hangs for
# 15+ minutes with no error.  A raw TCP probe detects that state cheaply.
AXON_RELAY = ("127.0.0.1", 8082)


def _relay_up(timeout: float = 3.0) -> bool:
    try:
        with socket.create_connection(AXON_RELAY, timeout=timeout):
            return True
    except OSError:
        return False


def ensure_accelerator(wait_s: float | None = None) -> bool:
    """Gate the first jax backend touch on the axon relay being alive.

    Only acts when the ambient platform is the axon tunnel (driver/dev
    boxes reach the TPU through it; real-TPU hosts are unaffected).
    Retries the TCP probe for up to ``wait_s`` seconds
    (``SCZK_TUNNEL_WAIT`` overrides, default 120), then falls back to
    the CPU backend so the caller still completes and reports, instead
    of hanging until the harness timeout.  Returns True if the
    accelerator path is usable, False on CPU fallback.
    """
    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return True
    if wait_s is None:
        wait_s = float(os.environ.get("SCZK_TUNNEL_WAIT", "120"))
    deadline = time.time() + wait_s
    while True:
        if _relay_up():
            return True
        if time.time() >= deadline:
            break
        print("# axon relay down; retrying probe...", file=sys.stderr)
        time.sleep(min(15.0, max(deadline - time.time(), 0.1)))
    print(
        "# axon relay unreachable -> CPU fallback (no TPU measurement)",
        file=sys.stderr,
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    return False


def enable_compile_cache(default_dir: str | Path) -> None:
    """Point jax's persistent compilation cache at ``default_dir``.

    Honors ``SCZK_COMPILE_CACHE`` (path override; "0" disables).
    No-op on the CPU backend (see module docstring).
    """
    import jax

    cache_dir = os.environ.get("SCZK_COMPILE_CACHE", str(default_dir))
    if cache_dir and cache_dir != "0" and jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    # benchmark-SRS disk cache rides along: stable SRS values are ALSO
    # what makes the phase executables' cache keys stable across
    # processes (the SRS levels are embedded as jaxpr constants)
    if cache_dir and cache_dir != "0":
        os.environ.setdefault(
            "SCZK_SRS_CACHE", str(Path(cache_dir) / "srs")
        )


@functools.cache
def _checksum():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _sum(out):
        return functools.reduce(
            lambda a, b: a + b.ravel()[0].astype(jnp.uint32),
            jax.tree.leaves(out),
            jnp.uint32(0),
        )

    return _sum


def barrier(out):
    """Block until ``out`` is fully materialized on device; returns a
    checksum scalar (consuming every leaf defeats DCE *and* the
    tunnel's early-return)."""
    import jax

    return jax.device_get(_checksum()(out))


@functools.cache
def _leaf_digest():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def dig(a):
        x = a.ravel().astype(jnp.uint32)
        w = (jnp.arange(x.size, dtype=jnp.uint32) % jnp.uint32(8191)) + 1
        return jnp.sum(x * w, dtype=jnp.uint32)

    return dig


def canonicalize_proof(out):
    """Normalize every G1 point in a proof bundle to its canonical
    representative (affine (x, y, 1) or infinity (0, 1, 0)).

    MSM backends legitimately differ in the Jacobian representative they
    return (native FFI Pippenger vs the dense-scan TPU core vs the naive
    ladder; window width and signed-digit choices also change Z), so a
    VALUE comparison across backends must canonicalize first.  Field
    values are already canonical (Montgomery limbs reduced mod p)."""
    import jax

    from ..curves.g1 import PointJ, bls12_381_g1

    cv = bls12_381_g1()
    is_pt = lambda x: isinstance(x, PointJ)
    return jax.tree.map(
        lambda x: cv.normalize(x) if is_pt(x) else x, out, is_leaf=is_pt
    )


@functools.cache
def _bundle_digest_fn():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def dig_all(out):
        canon = canonicalize_proof(out)

        def dig(a):
            x = a.ravel().astype(jnp.uint32)
            w = (jnp.arange(x.size, dtype=jnp.uint32) % jnp.uint32(8191)) + 1
            return jnp.sum(x * w, dtype=jnp.uint32)

        return tuple(dig(leaf) for leaf in jax.tree.leaves(canon))

    return dig_all


def proof_digest(out) -> int:
    """Order-sensitive 64-bit digest of a proof bundle.

    G1 points are canonicalized to affine first (see
    :func:`canonicalize_proof`), then per-leaf position-weighted uint32
    checksums are folded host-side; any single-bit change in any VALUE
    (or a leaf-order change) flips the digest, while representation
    differences between MSM backends do not.  This is what lets one
    CPU-pinned digest certify the MXU/Pallas paths on real hardware
    (bench.py conformance).  All device work (canonicalize + per-leaf
    checksums) runs as ONE jitted dispatch — per-leaf round-trips cost
    ~0.1 s each over the axon tunnel and a flagship bundle has hundreds
    of leaves."""
    import jax

    digs = jax.device_get(_bundle_digest_fn()(out))
    d = 0
    for leaf in digs:
        d = (d * 1000003 + int(leaf)) % (1 << 64)
    return d
