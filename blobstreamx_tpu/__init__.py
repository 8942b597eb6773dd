"""blobstreamx_tpu — a TPU-native ZK proving library with the capability
surface of the Blobstream X stack (see SURVEY.md; north star at
/root/repo/BASELINE.json:5).

Layering (bottom-up; SURVEY.md §1.2 mapping):
- ``golden``   — pure-Python spec oracles (no JAX).
- ``fields``   — JAX integer field arithmetic: Goldilocks (u32 pairs),
                 GF(p^2), and the Ed25519 field 2^255-19 (16-bit limbs).
- ``ops``      — single-chip batched kernels (jnp + Pallas): Poseidon,
                 SHA-256, NTT/LDE, Merkle builders, Pippenger MSM, FRI fold.
- ``parallel`` — multi-chip shard_map programs over a jax.sharding.Mesh:
                 six-step all-to-all NTT, sharded tree builders, sharded MSM.
- ``prover``   — Fiat-Shamir challenger, AIR constraint evaluation, the
                 phase-pipelined STARK prover/verifier.
- ``models``   — the Blobstream workloads: skip, step, data-commitment.
- ``utils``    — timing, metrics, checkpointing, config.
"""

__version__ = "0.1.0"
