"""The skip/step prover pipeline (component C10, SURVEY.md §2.2:
"prove_skip() JAX pipeline spanning all kernels; skip-proof wall-clock is the
north-star metric", /root/repo/BASELINE.json:2,11).

Pipeline for one skip proof (phases mirror SURVEY.md §3.4's behavioral flow,
re-architected: no recursion, no circuit DSL):

  witness   host: pack the ChainFixture slice into device tensors      (C9)
  consensus device: valset hashing, Ed25519 MSM batch, inclusion folds,
            chain links, power sums, data commitment       (C4-C6, C14-C16)
  trace     host: lay out the consensus-arithmetic execution trace
  stark     device: DEEP-ALI prove over SkipAir                    (C8, C10)

Trust model (stated precisely, as the docs promise): the DEEP-ALI STARK
proves the *consensus arithmetic* — boolean signer masks, voting-power
accumulators, their claimed totals — over a committed trace whose public
inputs bind the trusted/target roots, heights, and the data commitment into
the Fiat-Shamir transcript. The hash/signature facts (SHA-256 trees, Ed25519
batch equation) are established by bit-exact deterministic device
recomputation in the same pipeline (upstream delegated these to Curta
auxiliary STARKs, SURVEY.md §2.2 C4/C6 [R]; prover.sha_air is this
framework's first step on that path). verify_skip_proof() re-checks the
STARK, the threshold inequalities over the public integers, and recomputes
nothing heavier than transcripts.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from blobstreamx_tpu.circuits.skip import SkipCheckResult, SkipPublicOutputs, verify_skip
from blobstreamx_tpu.circuits.step import StepCheckResult, verify_step
from blobstreamx_tpu.circuits.witness import SkipWitness
from blobstreamx_tpu.golden import goldilocks as gold
from blobstreamx_tpu.prover import stark
from blobstreamx_tpu.prover.air import Air
from blobstreamx_tpu.prover.config import StarkConfig
from blobstreamx_tpu.utils.checkpoint import PhaseCheckpointer
from blobstreamx_tpu.utils.metrics import MetricsWriter
from blobstreamx_tpu.utils.timing import TimingTree

P = gold.P


class SkipAir(Air):
    """Consensus arithmetic of the skip relation, one validator per row
    (rows padded with power=0, bit=0 to a power of two).

    Columns: 0 tp (target-set power), 1 tb (signed bit), 2 ta (signed acc),
    3 tt (total acc), 4 rp (trusted power), 5 rb (trusted-signed bit),
    6 ra (signed acc), 7 rt (total acc).

    Publics: [0] signed_target, [1] total_target, [2] signed_trusted,
    [3] total_trusted, then 8 u32 words each of trusted_root, target_root,
    data_commitment, then trusted_height, target_height (30 total). Only
    0-3 appear in constraints; the rest are transcript-bound (stark.prove
    observes every public before sampling alpha).
    """

    n_cols = 8
    max_degree = 2
    N_PUBLICS = 30

    def eval_constraints(self, local, nxt, publics, alg, **frame):
        tp, tb, ta, tt, rp, rb, ra, rt = local
        tp_n, tb_n, ta_n, tt_n, rp_n, rb_n, ra_n, rt_n = nxt
        one = alg.const(1)
        cs = []
        for b in (tb, rb):  # booleanity
            cs.append((alg.mul(b, alg.sub(b, one)), "all"))
        # first-row accumulator initialisation
        cs.append((alg.sub(ta, alg.mul(tb, tp)), "first"))
        cs.append((alg.sub(tt, tp), "first"))
        cs.append((alg.sub(ra, alg.mul(rb, rp)), "first"))
        cs.append((alg.sub(rt, rp), "first"))
        # transitions: acc' = acc + bit' * power'
        cs.append((alg.sub(ta_n, alg.add(ta, alg.mul(tb_n, tp_n))), "transition"))
        cs.append((alg.sub(tt_n, alg.add(tt, tp_n)), "transition"))
        cs.append((alg.sub(ra_n, alg.add(ra, alg.mul(rb_n, rp_n))), "transition"))
        cs.append((alg.sub(rt_n, alg.add(rt, rp_n)), "transition"))
        # last row pins the four public sums
        cs.append((alg.sub(ta, publics[0]), "last"))
        cs.append((alg.sub(tt, publics[1]), "last"))
        cs.append((alg.sub(ra, publics[2]), "last"))
        cs.append((alg.sub(rt, publics[3]), "last"))
        return cs


class StepAir(Air):
    """Consensus arithmetic of the step relation (SURVEY.md §2.2 C13), one
    validator of the NEW set per row: p (power), b (signed bit), a (signed
    acc), t (total acc). Publics: [0] signed, [1] total, then 8 u32 words
    each of prev_root and new_root, then prev_height, new_height (20)."""

    n_cols = 4
    max_degree = 2
    N_PUBLICS = 20

    def eval_constraints(self, local, nxt, publics, alg, **frame):
        p, b, a, t = local
        p_n, b_n, a_n, t_n = nxt
        one = alg.const(1)
        return [
            (alg.mul(b, alg.sub(b, one)), "all"),
            (alg.sub(a, alg.mul(b, p)), "first"),
            (alg.sub(t, p), "first"),
            (alg.sub(a_n, alg.add(a, alg.mul(b_n, p_n))), "transition"),
            (alg.sub(t_n, alg.add(t, p_n)), "transition"),
            (alg.sub(a, publics[0]), "last"),
            (alg.sub(t, publics[1]), "last"),
        ]


def _pack_bytes32(b: bytes) -> list[int]:
    return [int.from_bytes(b[i : i + 4], "big") for i in range(0, 32, 4)]


def skip_publics(res_outputs: SkipPublicOutputs, res: SkipCheckResult) -> list[int]:
    return (
        [
            res.signed_target_power,
            res.total_target_power,
            res.signed_trusted_power,
            res.total_trusted_power,
        ]
        + _pack_bytes32(res_outputs.trusted_root)
        + _pack_bytes32(res_outputs.target_root)
        + _pack_bytes32(res_outputs.data_commitment)
        + [res_outputs.trusted_height, res_outputs.target_height]
    )


def build_skip_trace(res: SkipCheckResult) -> np.ndarray:
    n = max(len(res.target_powers), len(res.trusted_powers), 2)
    n = 1 << (n - 1).bit_length()

    def cols(powers, signed):
        p = np.zeros(n, dtype=np.uint64)
        b = np.zeros(n, dtype=np.uint64)
        p[: len(powers)] = powers
        b[: len(signed)] = signed.astype(np.uint64)
        acc = np.cumsum((p * b).astype(object))  # python-int cumsum, no overflow
        tot = np.cumsum(p.astype(object))
        return p, b, np.array([int(x) % P for x in acc], np.uint64), np.array(
            [int(x) % P for x in tot], np.uint64
        )

    tp, tb, ta, tt = cols(res.target_powers, res.target_signed)
    rp, rb, ra, rt = cols(res.trusted_powers, res.trusted_signed)
    return np.stack([tp, tb, ta, tt, rp, rb, ra, rt], axis=1)


@dataclass
class SkipProof:
    outputs: SkipPublicOutputs
    publics: list[int]
    n_rows: int
    stark: stark.StarkProof
    timing: str  # rendered TimingTree
    # optional batched-SHA STARK proving every hash of the data-commitment
    # tuple tree (prover.sha_claims; the Curta-analog path)
    sha_stark: object | None = None
    # optional Ed25519 scalar-mul STARK proving the signature batch equation
    # (prover.ed_claims; the Curta-analog of upstream's in-STARK Ed25519)
    ed_stark: object | None = None


PHASES = ["consensus", "trace", "stark", "sha_stark", "ed_stark"]


def signature_items(witness: SkipWitness) -> list[tuple[bytes, bytes, bytes]]:
    """The (pubkey, message, signature) triples of the target commit's
    claimed signers — the batch both the device MSM and the Ed25519 STARK
    verify (same construction as circuits.skip.verify_skip)."""
    return [
        (pk, witness.sign_bytes, sig)
        for pk, sig, s in zip(
            witness.target_set.pubkeys, witness.signatures, witness.target_signed
        )
        if s
    ]


def prove_skip(
    witness: SkipWitness,
    config: StarkConfig | None = None,
    mesh=None,
    metrics: MetricsWriter | None = None,
    checkpoint_dir: str | None = None,
    with_sha_stark: bool = False,
    with_ed_stark: bool = False,
) -> SkipProof:
    """Full config-5 pipeline. Raises ValueError (fail-stop, SURVEY.md §5.3)
    if the witness does not satisfy the skip relation. with_sha_stark=True
    additionally proves the data-commitment tuple tree's hashes in the
    batched SHA-256 STARK instead of trusting device recomputation;
    with_ed_stark=True likewise proves the signature batch equation in the
    Ed25519 scalar-mul STARK (prover.ed_claims)."""
    config = config or StarkConfig()
    metrics = metrics or MetricsWriter(None)
    ckpt = PhaseCheckpointer(checkpoint_dir, metrics.run_id)
    timing = TimingTree("prove_skip")

    with timing.scope(
        "consensus", items=len(witness.range_heights), unit="headers"
    ):
        res = verify_skip(witness, mesh=mesh)
    if not res.ok:
        metrics.emit("skip_rejected", reasons=res.reasons)
        raise ValueError(f"skip relation unsatisfied: {res.reasons}")
    ckpt.save(
        "consensus",
        scalars={
            "signed_target": res.signed_target_power,
            "total_target": res.total_target_power,
            "signed_trusted": res.signed_trusted_power,
            "total_trusted": res.total_trusted_power,
            "data_commitment": res.outputs.data_commitment.hex(),
        },
    )

    with timing.scope("trace"):
        trace = build_skip_trace(res)
        publics = skip_publics(res.outputs, res)
    ckpt.save("trace", arrays={"trace": trace})

    with timing.scope("stark", items=trace.shape[0], unit="rows"):
        proof = stark.prove(SkipAir(), trace, publics, config)
    ckpt.save("stark", scalars={"done": 1})

    sha_proof = None
    if with_sha_stark:
        from blobstreamx_tpu.prover import sha_claims

        heights = [int(h) for h in witness.range_heights]
        with timing.scope("sha_stark", items=len(heights), unit="leaves"):
            sha_proof, sha_root = sha_claims.prove_data_commitment_stark(
                heights, witness.range_data_hashes, config
            )
        if sha_root != res.outputs.data_commitment:
            raise ValueError("sha-stark root mismatch vs device data commitment")
    ckpt.save("sha_stark", scalars={"done": 1})

    ed_proof = None
    if with_ed_stark:
        from blobstreamx_tpu.prover import ed_claims

        items = signature_items(witness)
        with timing.scope("ed_stark", items=len(items), unit="signatures"):
            ed_proof = ed_claims.prove_batch_stark(items, config=config, mesh=mesh)
    ckpt.save("ed_stark", scalars={"done": 1})

    timing.finish()
    metrics.emit_timing(
        timing,
        n_headers=int(len(witness.range_heights)),
        n_validators=int(len(res.target_powers)),
        n_rows=int(trace.shape[0]),
    )
    return SkipProof(
        outputs=res.outputs,
        publics=publics,
        n_rows=trace.shape[0],
        stark=proof,
        timing=timing.render(),
        sha_stark=sha_proof,
        ed_stark=ed_proof,
    )


@dataclass
class StepProof:
    outputs: "object"  # StepPublicOutputs
    publics: list[int]
    n_rows: int
    stark: stark.StarkProof
    timing: str


def step_publics(res: StepCheckResult) -> list[int]:
    out = res.outputs
    return (
        [res.signed_power, res.total_power]
        + _pack_bytes32(out.prev_root)
        + _pack_bytes32(out.new_root)
        + [out.prev_height, out.new_height]
    )


def build_step_trace(res: StepCheckResult) -> np.ndarray:
    n = max(len(res.powers), 2)
    n = 1 << (n - 1).bit_length()
    p = np.zeros(n, dtype=np.uint64)
    b = np.zeros(n, dtype=np.uint64)
    p[: len(res.powers)] = res.powers
    b[: len(res.signed)] = res.signed.astype(np.uint64)
    acc = np.cumsum((p * b).astype(object))
    tot = np.cumsum(p.astype(object))
    return np.stack(
        [
            p,
            b,
            np.array([int(x) % P for x in acc], np.uint64),
            np.array([int(x) % P for x in tot], np.uint64),
        ],
        axis=1,
    )


def prove_step(witness, config: StarkConfig | None = None) -> StepProof:
    """The step workload pipeline (header h -> h+1): device consensus checks,
    then the DEEP-ALI STARK over StepAir."""
    config = config or StarkConfig()
    timing = TimingTree("prove_step")
    with timing.scope("consensus"):
        res = verify_step(witness)
    if not res.ok:
        raise ValueError(f"step relation unsatisfied: {res.reasons}")
    with timing.scope("trace"):
        trace = build_step_trace(res)
        publics = step_publics(res)
    with timing.scope("stark", items=trace.shape[0], unit="rows"):
        proof = stark.prove(StepAir(), trace, publics, config)
    timing.finish()
    return StepProof(
        outputs=res.outputs,
        publics=publics,
        n_rows=trace.shape[0],
        stark=proof,
        timing=timing.render(),
    )


def verify_step_proof(proof: StepProof, config: StarkConfig | None = None) -> bool:
    """Host verifier for a step proof: >2/3 threshold over the public sums,
    public consistency with the claimed outputs, and the STARK."""
    config = config or StarkConfig()
    pub = proof.publics
    if len(pub) != StepAir.N_PUBLICS:
        return False
    signed, total = pub[:2]
    if not signed * 3 > total * 2:
        return False
    out = proof.outputs
    if pub[2:10] != _pack_bytes32(out.prev_root):
        return False
    if pub[10:18] != _pack_bytes32(out.new_root):
        return False
    if pub[18:] != [out.prev_height, out.new_height]:
        return False
    if out.new_height != out.prev_height + 1:
        return False
    return stark.verify(StepAir(), proof.stark, pub, config, proof.n_rows)


def verify_skip_proof(
    proof: SkipProof,
    config: StarkConfig | None = None,
    range_heights: list[int] | None = None,
    range_data_hashes: list[bytes] | None = None,
    sign_items: list[tuple[bytes, bytes, bytes]] | None = None,
) -> bool:
    """Host verifier: STARK transcript + threshold inequalities + public
    consistency (roots/heights/commitment are bound by the transcript).
    When the proof carries a sha_stark and the verifier supplies the claimed
    range (heights, data_hashes), the data commitment's hash tree is checked
    against the batched SHA-256 STARK as well; when it carries an ed_stark
    and the verifier supplies the claimed (pubkey, message, signature)
    triples, the signature batch equation is checked against the Ed25519
    scalar-mul STARK (the verifier performs no scalar multiplications)."""
    config = config or StarkConfig()
    pub = proof.publics
    if len(pub) != SkipAir.N_PUBLICS:
        return False
    signed_t, total_t, signed_r, total_r = pub[:4]
    if not (signed_t * 3 > total_t * 2 and signed_r * 3 > total_r):
        return False
    out = proof.outputs
    if pub[4:12] != _pack_bytes32(out.trusted_root):
        return False
    if pub[12:20] != _pack_bytes32(out.target_root):
        return False
    if pub[20:28] != _pack_bytes32(out.data_commitment):
        return False
    if pub[28:] != [out.trusted_height, out.target_height]:
        return False
    if out.target_height <= out.trusted_height:
        return False
    if not stark.verify(SkipAir(), proof.stark, pub, config, proof.n_rows):
        return False
    if proof.sha_stark is not None and range_heights is not None:
        from blobstreamx_tpu.prover import sha_claims

        if not sha_claims.verify_data_commitment_stark(
            proof.sha_stark,
            [int(h) for h in range_heights],
            range_data_hashes,
            out.data_commitment,
            config,
        ):
            return False
    if proof.ed_stark is not None and sign_items is not None:
        from blobstreamx_tpu.prover import ed_claims

        if not ed_claims.verify_batch_stark(proof.ed_stark, sign_items, config=config):
            return False
    return True
