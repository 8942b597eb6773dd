"""FRI commit/query phases on device (component C7, SURVEY.md §2.2;
config 4 at /root/repo/BASELINE.json:10).

- ``fold_codeword``: the arity-2 fold as a strided-pair elementwise kernel
  (reuses the NTT twiddle-table infrastructure for the 1/x_i factors).
- ``grind``: proof-of-work nonce search, batched on device (2^14 forked
  challenger states per permutation batch), returning the same first nonce
  the sequential golden grind finds.
- ``fri_prove``: full commit + query phases. Codewords and Merkle layers stay
  device-resident; the Fiat-Shamir transcript (tiny, sequential) runs on the
  host golden challenger, so proofs are bit-identical to the golden prover
  and verify with golden.fri.fri_verify.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from blobstreamx_tpu.fields import gf64
from blobstreamx_tpu.fields.gf64 import Gl, gl_add, gl_mul, gl_sub
from blobstreamx_tpu.golden import fri as gold_fri, goldilocks as gold
from blobstreamx_tpu.golden.challenger import Challenger
from blobstreamx_tpu.golden.fri import FriConfig, FriLayerProof, FriProof, FriQueryRound
from blobstreamx_tpu.golden.poseidon import RATE, WIDTH
from blobstreamx_tpu.ops import merkle as merkle_ops, ntt as ntt_ops, poseidon as pos

P = gold.P
INV2 = gold.inv(2)


def _xinv_table(log_n: int, shift: int) -> np.ndarray:
    """(shift * w^i)^-1 for i < n/2, as uint64 (host, cached via power_table)."""
    inv_pow = ntt_ops.power_table(log_n, inverse=True)  # w^-i, i < n/2
    s_inv = np.uint64(gold.inv(shift))
    # multiply mod p on host python ints (table cached upstream; this product
    # is cheap relative to table generation)
    si = int(s_inv)
    return np.array([(int(v) * si) % P for v in inv_pow], dtype=np.uint64)


def fold_codeword(evals: Gl, beta: int, shift: int) -> Gl:
    """One arity-2 fold: (n,) on shift*<w>  ->  (n/2,) on shift^2*<w^2>."""
    n = evals[0].shape[0]
    log_n = n.bit_length() - 1
    half = n // 2
    fe = (evals[0][:half], evals[1][:half])
    fo = (evals[0][half:], evals[1][half:])
    inv2 = gf64.full((half,), INV2)
    xinv = gf64.from_u64(_xinv_table(log_n, shift))
    even = gl_mul(gl_add(fe, fo), inv2)
    odd = gl_mul(gl_mul(gl_sub(fe, fo), inv2), xinv)
    b = gf64.full((half,), beta % P)
    return gl_add(even, gl_mul(b, odd))


# ----------------------------------------------------------------------------
# proof-of-work grind
# ----------------------------------------------------------------------------


def _grind_batch(state12: list[int], pending: list[int], start: int, batch: int):
    """Poseidon-permute `batch` forked challenger states with nonces
    start..start+batch-1 and return the sampled values' (lo, hi) words."""
    lo = np.zeros((WIDTH, batch), dtype=np.uint32)
    hi = np.zeros((WIDTH, batch), dtype=np.uint32)
    for i, v in enumerate(state12):
        lo[i, :] = v & 0xFFFFFFFF
        hi[i, :] = v >> 32
    for i, v in enumerate(pending):
        lo[i, :] = v & 0xFFFFFFFF
        hi[i, :] = v >> 32
    k = len(pending)
    nonces = np.arange(start, start + batch, dtype=np.uint64)
    lo[k, :] = (nonces & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi[k, :] = (nonces >> np.uint64(32)).astype(np.uint32)
    out = _permute_jit((jnp.asarray(lo), jnp.asarray(hi)))
    # golden sample() pops output_buffer[-1] == state[RATE-1]
    return out[0][RATE - 1], out[1][RATE - 1]


_permute_jit = jax.jit(pos.permute)


def grind(challenger: Challenger, bits: int, batch: int = 1 << 14, max_batches: int = 1 << 12) -> int:
    """First nonce n>=0 such that fork(observe(n); sample()) has `bits`
    leading zero bits. Bit-identical to golden.fri.grind, but evaluates
    nonce batches in one device permutation call.

    Requires len(pending inputs) <= RATE-1 (true for our transcripts; the
    grind follows observe_many(final_poly) which flushes in RATE chunks)."""
    assert 0 < bits <= 32
    pending = list(challenger.input_buffer)
    assert len(pending) < RATE
    state = list(challenger.state)
    bound = np.uint32(1 << (32 - bits)) if bits < 32 else np.uint32(1)
    for b in range(max_batches):
        start = b * batch
        lo, hi = _grind_batch(state, pending, start, batch)
        ok = np.asarray(hi < bound)
        if ok.any():
            return start + int(np.argmax(ok))
    raise RuntimeError("grind exhausted max_batches")


# ----------------------------------------------------------------------------
# full prover
# ----------------------------------------------------------------------------


def _pair_leaves(evals: Gl) -> Gl:
    half = evals[0].shape[0] // 2
    return (
        jnp.stack([evals[0][:half], evals[0][half:]], axis=0),
        jnp.stack([evals[1][:half], evals[1][half:]], axis=0),
    )


def fri_prove(
    evals: Gl, config: FriConfig, challenger: Challenger, shift: int = gold.COSET_SHIFT
) -> FriProof:
    """Device FRI prover; output verifies with golden.fri.fri_verify."""
    n = evals[0].shape[0]
    assert n & (n - 1) == 0
    codewords = [evals]
    trees: list[merkle_ops.PoseidonTree] = []
    betas = []
    cur_shift = shift % P
    size = n
    while size > config.final_poly_len:
        leaves = _pair_leaves(codewords[-1])
        ch = min(config.cap_height, (size // 2 - 1).bit_length())
        tree = merkle_ops.build_tree(leaves, ch)
        trees.append(tree)
        for digest in merkle_ops.cap_to_ints(tree):
            challenger.observe_many(digest)
        beta = challenger.sample()
        betas.append(beta)
        codewords.append(fold_codeword(codewords[-1], beta, cur_shift))
        cur_shift = (cur_shift * cur_shift) % P
        size //= 2

    final_cw = codewords[-1]
    final_coeffs = ntt_ops.coset_intt_cols(
        (final_cw[0][:, None], final_cw[1][:, None]), cur_shift
    )
    final_np = gf64.to_u64((final_coeffs[0][:, 0], final_coeffs[1][:, 0]))
    final_poly = [int(v) for v in final_np[: config.final_poly_len >> config.rate_bits]]
    challenger.observe_many(final_poly)

    pow_nonce = grind(challenger, config.proof_of_work_bits)
    challenger.observe(pow_nonce)
    pow_sample = challenger.sample()
    assert pow_sample >> (64 - config.proof_of_work_bits) == 0

    indices = challenger.sample_indices(config.num_query_rounds, n // 2)
    # host-resident codeword copies for query extraction
    host_cw = [gf64.to_u64(cw) for cw in codewords[:-1]]
    query_rounds = []
    for idx in indices:
        layers = []
        i = idx
        for ell, cw in enumerate(host_cw):
            half = cw.shape[0] // 2
            i %= half
            path, _ = trees[ell].path(i)
            layers.append(
                FriLayerProof(pair=(int(cw[i]), int(cw[i + half])), path=path)
            )
        query_rounds.append(FriQueryRound(layers=layers))

    caps = [merkle_ops.cap_to_ints(t) for t in trees]
    return FriProof(
        caps=caps,
        final_poly=final_poly,
        pow_nonce=pow_nonce,
        query_rounds=query_rounds,
        betas=betas,
    )
