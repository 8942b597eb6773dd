"""Workload facades (blobstreamx_tpu.models): the documented user API
resolves to the real pipeline entry points."""


class TestFacades:
    def test_skip_surface(self):
        from blobstreamx_tpu.models import skip

        for name in ("generate_chain", "build_witness", "prove", "verify", "to_bytes", "from_bytes"):
            assert callable(getattr(skip, name))

    def test_step_surface(self):
        from blobstreamx_tpu.models import step

        for name in ("generate_chain", "build_witness", "prove", "verify"):
            assert callable(getattr(step, name))

    def test_sha_surface(self):
        from blobstreamx_tpu.models import sha256_stark

        for name in ("prove_data_commitment", "verify_data_commitment", "plan_blocks"):
            assert callable(getattr(sha256_stark, name))
