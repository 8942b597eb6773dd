"""Phase pipelining across proofs (SURVEY.md §2.3 PP: "witness gen on host
overlapped with device hashing/NTT of the previous batch — double-buffered,
not a primary axis").

Upstream proves ranges sequentially per request; a relayer catching up over
many skip intervals pays host witness generation (fixture packing, byte
encoding, scalar prep — pure Python/numpy) in series with device compute.
Here a background worker builds witness i+k while the device proves witness
i: JAX kernels release the GIL during device execution and every hot device
program is dispatched asynchronously, so the two stages genuinely overlap on
one host. Depth `prefetch` bounds live witnesses (double-buffered at 1).

    jobs = [(chain, 1, 64), (chain, 64, 128), ...]
    for proof in prove_pipelined(
        (lambda c=c, a=a, b=b: build_skip_witness(c, a, b)) for c, a, b in jobs
    ):
        ...

The proof stream preserves job order. Bit-exactness is untouched: pipelining
reorders *host wall-clock*, never device reduction order (SURVEY.md §5.2).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator

from blobstreamx_tpu.prover.pipeline import SkipProof, prove_skip


def prove_pipelined(
    witness_builders: Iterable[Callable[[], object]],
    prove_fn: Callable[..., SkipProof] = prove_skip,
    prefetch: int = 1,
    **prove_kwargs,
) -> Iterator[SkipProof]:
    """Prove a stream of witnesses with host witness-build overlapped against
    device proving. witness_builders yields zero-arg callables (each builds
    one witness on the worker thread); results are yielded in order.

    prefetch >= 1: how many witnesses may be built ahead of the prover.
    """
    assert prefetch >= 1
    it = iter(witness_builders)
    pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="witness")
    try:
        pending = []
        try:
            for _ in range(prefetch):
                pending.append(pool.submit(next(it)))
        except StopIteration:
            pass
        exhausted = len(pending) < prefetch
        while pending:
            fut = pending.pop(0)
            witness = fut.result()  # propagate builder exceptions in order
            if not exhausted:
                try:
                    pending.append(pool.submit(next(it)))
                except StopIteration:
                    exhausted = True
            yield prove_fn(witness, **prove_kwargs)
    finally:
        # early generator close must not block on an in-flight witness build
        # (shutdown(wait=True) would); cancel what never started and detach
        pool.shutdown(wait=False, cancel_futures=True)
