"""NTT conformance vs a naive Python DFT oracle (arkworks fft semantics)."""

import jax
import numpy as np
import pytest

from scalable_collaborative_zksnark_tpu.fields.fr import get_field
from scalable_collaborative_zksnark_tpu.ntt.ntt import Domain, intt, ntt, ntt_4step

F = get_field("bls12_377_fr")


def naive_dft(cs, size, offset):
    p = F.p
    g = F.spec.root_of_unity(size)
    cs = (cs + [0] * size)[:size]
    return [
        sum(c * pow(offset * pow(g, i, p) % p, k, p) for k, c in enumerate(cs)) % p
        for i in range(size)
    ]


@pytest.mark.parametrize("size", [2, 8, 16])
@pytest.mark.parametrize("coset", [False, True])
def test_ntt_matches_dft(size, coset):
    offset = F.spec.generator if coset else 1
    dom = Domain(F.spec.name, size, offset)
    rng = np.random.RandomState(size)
    cs = [int.from_bytes(rng.bytes(40), "little") % F.p for _ in range(size)]
    a = F.array_from_ints(cs)
    ev = F.array_to_ints(jax.jit(lambda x: ntt(F, dom, x))(a))
    assert list(ev) == naive_dft(cs, size, offset)


@pytest.mark.parametrize("size", [8, 16])
def test_ntt_roundtrip_coset(size):
    dom = Domain(F.spec.name, size, F.spec.generator)
    rng = np.random.RandomState(7 + size)
    cs = [int.from_bytes(rng.bytes(40), "little") % F.p for _ in range(size)]
    a = F.array_from_ints(cs)
    back = F.array_to_ints(intt(F, dom, ntt(F, dom, a)))
    assert list(back) == cs


def test_ntt_zero_pad_semantics():
    # arkworks fft_in_place resizes (zero-pads) short inputs
    size = 16
    dom = Domain(F.spec.name, size, 1)
    rng = np.random.RandomState(42)
    cs = [int.from_bytes(rng.bytes(40), "little") % F.p for _ in range(size // 4)]
    a = F.array_from_ints(cs)
    ev = F.array_to_ints(ntt(F, dom, a))
    assert list(ev) == naive_dft(cs, size, 1)


def test_ntt_truncate_semantics():
    # arkworks fft_in_place truncates inputs longer than the domain
    size = 8
    dom = Domain(F.spec.name, size, 1)
    rng = np.random.RandomState(43)
    cs = [int.from_bytes(rng.bytes(40), "little") % F.p for _ in range(size * 2)]
    a = F.array_from_ints(cs)
    ev = F.array_to_ints(ntt(F, dom, a))
    assert list(ev) == naive_dft(cs[:size], size, 1)


@pytest.mark.parametrize("coset", [False, True])
def test_ntt_4step_equals_direct(coset):
    size, rows = 16, 4
    offset = F.spec.generator if coset else 1
    dom = Domain(F.spec.name, size, offset)
    rng = np.random.RandomState(17)
    cs = [int.from_bytes(rng.bytes(40), "little") % F.p for _ in range(size)]
    a = F.array_from_ints(cs)
    direct = F.array_to_ints(ntt(F, dom, a))
    four = F.array_to_ints(jax.jit(lambda x: ntt_4step(F, dom, x, rows=rows))(a))
    assert list(four) == list(direct)


def test_ntt_batched():
    size = 8
    dom = Domain(F.spec.name, size, 1)
    rng = np.random.RandomState(5)
    batch = [[int.from_bytes(rng.bytes(40), "little") % F.p for _ in range(size)] for _ in range(3)]
    a = F.array_from_ints(batch)
    ev = F.array_to_ints(ntt(F, dom, a))
    for row in range(3):
        assert list(ev[row]) == naive_dft(batch[row], size, 1)
