"""Native host runtime (native/bsx_sha256.c via blobstreamx_tpu.native):
bit-exact against hashlib, the golden models, and the numpy trace builder."""

import hashlib

import numpy as np
import pytest

from blobstreamx_tpu import native
from blobstreamx_tpu.golden import merkle as gmerkle
from blobstreamx_tpu.prover import sha_air

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


class TestNativeSha:
    def test_sha256_vs_hashlib(self):
        for m in [b"", b"abc", b"a" * 55, b"a" * 56, b"a" * 64, b"xy" * 500]:
            assert native.sha256(m) == hashlib.sha256(m).digest()

    def test_tuple_root_vs_golden(self):
        rng = np.random.default_rng(1)
        for n in (1, 2, 3, 5, 8, 33):
            hts = list(range(10, 10 + n))
            dhs = [bytes(rng.integers(0, 256, 32, dtype=np.uint8)) for _ in range(n)]
            assert native.tuple_root(hts, dhs) == gmerkle.data_commitment(hts, dhs)

    def test_trace_fill_vs_numpy(self):
        msgs = [b"abc", b"q" * 77, b"", b"blob" * 40]
        chain, blocks = sha_air.plan_blocks(msgs)
        nat = native.sha_trace_fill(chain, blocks)
        ref = sha_air._build_sha_trace_numpy(chain, blocks)
        assert nat[1] == ref[1]
        assert np.array_equal(nat[0], ref[0])
