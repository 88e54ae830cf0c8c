import pytest


@pytest.fixture(scope="session")
def ray_session():
    import clp_core_ray
    import ray

    clp_core_ray._export_tuning_env()  # worker tuning env, pre-init opt-in

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()
