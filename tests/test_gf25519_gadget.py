"""GF(2^255-19) in-AIR gadgets (prover.gf25519_gadget): multiplication with
signed linear-combination operands, and the full unified Edwards addition
row — constraint vanishing + golden cross-checks + tamper probes."""

import numpy as np

from blobstreamx_tpu.fields import gf64
from blobstreamx_tpu.golden import ed25519 as ged, goldilocks as gold
from blobstreamx_tpu.prover import gf25519_gadget as gg
from blobstreamx_tpu.prover.air import DeviceAlgebra

P = gold.P


def _alg_cols(rows: np.ndarray):
    n, w = rows.shape
    gl = gf64.from_u64(rows % np.uint64(P))
    return DeviceAlgebra((n,)), [(gl[0][:, j], gl[1][:, j]) for j in range(w)]


def _signed_rows(rows_int: list[list[int]]) -> np.ndarray:
    """Map possibly-negative ints into the field as u64."""
    return np.array([[v % P for v in row] for row in rows_int], dtype=np.uint64)


def _check_vanish(values) -> np.ndarray:
    bad = []
    for idx, (v, kind) in enumerate(values):
        assert kind == "all"
        arr = gf64.to_u64(v)
        if arr.any():
            bad.append((idx, np.argwhere(arr != 0)[:3]))
    return bad


class TestMulGadget:
    def _rows(self, pairs):
        rows = []
        for a_l, b_l in pairs:
            w = gg.MulWitness(a_l, b_l)
            rows.append(list(a_l) + list(b_l) + w.witness_columns())
        return _signed_rows(rows)

    def test_vanishing_and_values(self):
        rng = np.random.default_rng(5)
        pairs = []
        for _ in range(6):
            a = int.from_bytes(rng.integers(0, 256, 32, dtype=np.uint8).tobytes(), "little") % ged.Q
            b = int.from_bytes(rng.integers(0, 256, 32, dtype=np.uint8).tobytes(), "little") % ged.Q
            w = gg.MulWitness(gg.to_limbs(a), gg.to_limbs(b))
            assert w.c == (a * b) % ged.Q
            pairs.append((gg.to_limbs(a), gg.to_limbs(b)))
        # signed linear-combination operands (differences go negative)
        a1, a2 = 5, ged.Q - 3
        diff = [x - y for x, y in zip(gg.to_limbs(a1), gg.to_limbs(a2))]
        w = gg.MulWitness(diff, gg.to_limbs(7))
        assert w.c == ((a1 - a2) * 7) % ged.Q
        pairs.append((diff, gg.to_limbs(7)))
        pairs.append((gg.to_limbs(0), gg.to_limbs(12345)))
        pairs.append((gg.to_limbs(ged.Q - 1), gg.to_limbs(ged.Q - 1)))
        rows = self._rows(pairs)
        n = rows.shape[0]
        alg, cols = _alg_cols(rows)
        a = cols[: gg.N_LIMBS]
        b = cols[gg.N_LIMBS : 2 * gg.N_LIMBS]
        wit = cols[2 * gg.N_LIMBS :]
        assert _check_vanish(gg.eval_mul_constraints(alg, a, b, wit)) == []

    def test_tampered_product_not_vanishing(self):
        w = gg.MulWitness(gg.to_limbs(3), gg.to_limbs(5))
        row = gg.to_limbs(3) + gg.to_limbs(5) + w.witness_columns()
        rows = _signed_rows([row])
        rows[0, 2 * gg.N_LIMBS] ^= 1  # flip a bit of c_0
        alg, cols = _alg_cols(rows)
        vals = gg.eval_mul_constraints(
            alg, cols[: gg.N_LIMBS], cols[gg.N_LIMBS : 2 * gg.N_LIMBS], cols[2 * gg.N_LIMBS :]
        )
        assert _check_vanish(vals) != []


class TestEdAddGadget:
    def _points(self, rng, k):
        pts = []
        for _ in range(k):
            s = int.from_bytes(rng.integers(0, 256, 32, dtype=np.uint8).tobytes(), "little") % ged.L
            p = ged.point_mul(max(s, 1), ged.BASE)
            pts.append(p)
        return pts

    def test_vanishing_and_golden(self):
        rng = np.random.default_rng(9)
        ps = self._points(rng, 4)
        qs = self._points(rng, 4)
        rows = []
        for p, q in zip(ps, qs):
            w = gg.EdAddWitness(p, q)
            # golden cross-check: the witnessed output equals the golden add
            want = ged.point_add(p, q)
            got = w.out
            # compare projectively: X/Z and Y/Z
            zi_w = pow(got[2], ged.Q - 2, ged.Q)
            zi_g = pow(want[2], ged.Q - 2, ged.Q)
            assert got[0] * zi_w % ged.Q == want[0] * zi_g % ged.Q
            assert got[1] * zi_w % ged.Q == want[1] * zi_g % ged.Q
            rows.append(w.columns())
        # identity + doubling edge cases
        rows.append(gg.EdAddWitness((0, 1, 1, 0), ps[0]).columns())
        rows.append(gg.EdAddWitness(ps[1], ps[1]).columns())
        arr = _signed_rows(rows)
        alg, cols = _alg_cols(arr)
        assert _check_vanish(gg.eval_ed_add_constraints(alg, cols)) == []
        assert arr.shape[1] == gg.N_EDADD_COLS

    def test_tampered_output_not_vanishing(self):
        rng = np.random.default_rng(10)
        (p,) = self._points(rng, 1)
        w = gg.EdAddWitness(p, p)
        row = w.columns()
        arr = _signed_rows([row])
        # flip a bit of X3's first limb (first c-limb of mul index 5)
        off = gg.N_EDADD_INPUT + 5 * gg.N_MUL_WITNESS
        arr[0, off] ^= 1
        alg, cols = _alg_cols(arr)
        assert _check_vanish(gg.eval_ed_add_constraints(alg, cols)) != []
