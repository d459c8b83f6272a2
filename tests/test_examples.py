"""Smoke tests for the L5 example CLIs (SURVEY §2.3/2.4 parity surface).

The reference's examples are its user-facing entry points
(dist-primitive/examples/*.rs, hyperplonk/examples/*.rs); ours must
keep running as the library evolves.  Each CLI main() runs in-process
at tiny sizes (shared jax runtime, no per-test interpreter+compile
cost) with patched argv; stdout must contain the expected report line.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _run(module, argv, capsys):
    import importlib

    mod = importlib.import_module(f"examples.{module}")
    old = sys.argv
    sys.argv = [module] + argv
    try:
        mod.main()
    finally:
        sys.argv = old
    return capsys.readouterr().out


TINY = ["--l", "1", "--n", "4", "--mode", "leader"]


def test_example_sumcheck(capsys):
    out = _run("sumcheck", TINY, capsys)
    assert "c_sumcheck_product" in out and "local sumcheck_product" in out


def test_example_msm(capsys):
    out = _run("msm", TINY, capsys)
    assert "d_msm" in out


def test_example_poly_comm(capsys):
    out = _run("poly_comm", TINY, capsys)
    assert "commit" in out and "open" in out


def test_example_prod_acc(capsys):
    out = _run("prod_acc", ["--l", "1", "--n", "5", "--mode", "leader"], capsys)
    assert "acc_product" in out


def test_example_permcheck(capsys):
    import os

    if not os.environ.get("SCZK_SLOW_TESTS"):
        pytest.skip("~100 s of eager protocol dispatch; the permcheck "
                    "pipelines are covered by test_hyperplonk/"
                    "test_acc_product/test_sharding (SCZK_SLOW_TESTS=1)")
    out = _run("permcheck", TINY + ["--variant", "d"], capsys)
    assert "permcheck" in out


def test_example_hyperplonk_dist(capsys):
    import os

    if not os.environ.get("SCZK_SLOW_TESTS"):
        pytest.skip("~85 s of eager protocol dispatch; dhyperplonk is "
                    "covered end-to-end by test_hyperplonk and the bench "
                    "smoke test (SCZK_SLOW_TESTS=1)")
    out = _run("hyperplonk", TINY + ["--variant", "dist"], capsys)
    assert "hyperplonk" in out.lower()


def test_example_hyperplonk_local_verify(capsys):
    out = _run(
        "hyperplonk", ["--l", "1", "--n", "2", "--variant", "local", "--verify"],
        capsys,
    )
    assert "ok=True" in out


def test_example_delegator(tmp_path, capsys):
    out = _run("delegator", TINY + ["--out", str(tmp_path)], capsys)
    assert "read-back reconstruction: OK" in out
    assert any(tmp_path.iterdir())
