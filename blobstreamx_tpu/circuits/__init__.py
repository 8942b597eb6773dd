"""Application/consensus layer (SURVEY.md §2.2 C12-C16): skip/step header-chain
workloads, data-commitment builder, validator-set gadgets, and header-field
inclusion proofs — a thin, statically-shaped witness + constraint-schedule
layer driving the device kernels in blobstreamx_tpu.ops (SURVEY.md §1.2,
§3.3: "no runtime circuit-DSL; shapes are static and known at trace time")."""
