import pytest


@pytest.fixture(scope="session")
def ray_session():
    import clp_core_ray  # noqa: F401  (exports worker tuning env pre-init)
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()
