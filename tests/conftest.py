import ray
import pytest


@pytest.fixture(scope="session")
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
    )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sequences_table(ray_session):
    from pymhealth_ray.sources.generate import generate_sequences

    return generate_sequences(3000, 40, seed=42)


@pytest.fixture(scope="session")
def sequences_ds(sequences_table):
    return ray.data.from_arrow(sequences_table)
