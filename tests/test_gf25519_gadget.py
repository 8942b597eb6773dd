"""GF(2^255-19) in-AIR multiplication gadget (prover.gf25519_gadget):
witness construction, constraint vanishing over a batch of rows, and
negative probes (wrong product / tampered carry must NOT vanish)."""

import numpy as np

from blobstreamx_tpu.fields import gf64
from blobstreamx_tpu.golden import ed25519 as ged, goldilocks as gold
from blobstreamx_tpu.prover import gf25519_gadget as gg
from blobstreamx_tpu.prover.air import DeviceAlgebra

P = gold.P


def _eval_rows(rows: np.ndarray) -> np.ndarray:
    """Evaluate the gadget constraints over an (n, N_COLS) row batch; returns
    the (n, 33) constraint-value matrix as u64."""
    n = rows.shape[0]
    gl = gf64.from_u64(rows % np.uint64(P))
    cols = [(gl[0][:, j], gl[1][:, j]) for j in range(gg.N_COLS)]
    alg = DeviceAlgebra((n,))
    (value, kind), = gg.eval_mul_constraints(alg, cols)
    assert kind == "all"
    return gf64.to_u64(value)


class TestMulGadget:
    def test_witness_and_vanishing(self):
        rng = np.random.default_rng(5)
        rows = []
        for _ in range(8):
            a = int.from_bytes(rng.integers(0, 256, 32, dtype=np.uint8).tobytes(), "little") % ged.Q
            b = int.from_bytes(rng.integers(0, 256, 32, dtype=np.uint8).tobytes(), "little") % ged.Q
            w = gg.MulWitness(a, b)
            assert gg.from_limbs(w.c_limbs) == (a * b) % ged.Q
            rows.append(w.columns())
        # edge cases: 0*x, 1*x, (q-1)^2, max loose representatives
        rows.append(gg.MulWitness(0, 12345).columns())
        rows.append(gg.MulWitness(1, ged.Q - 1).columns())
        rows.append(gg.MulWitness(ged.Q - 1, ged.Q - 1).columns())
        rows.append(gg.MulWitness((1 << 256) - 1, (1 << 256) - 1).columns())
        vals = _eval_rows(np.array(rows, dtype=np.uint64))
        assert not vals.any(), np.argwhere(vals != 0)[:4]

    def test_wrong_product_not_vanishing(self):
        w = gg.MulWitness(3, 5)
        row = np.array([w.columns()], dtype=np.uint64)
        row[0, 2 * gg.N_LIMBS] ^= 1  # flip a bit of c_0
        assert _eval_rows(row).any()

    def test_tampered_carry_not_vanishing(self):
        w = gg.MulWitness(1 << 200, 1 << 54)
        row = np.array([w.columns()], dtype=np.uint64)
        off = 3 * gg.N_LIMBS + gg.N_QLIMBS
        row[0, off + 3] += 1  # bump a carry limb
        assert _eval_rows(row).any()

    def test_range_checked_cover_all(self):
        assert gg.range_checked_columns() == list(range(gg.N_COLS))
        assert gg.N_COLS == 129
