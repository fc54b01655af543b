"""Guard: the suite must run on the 8-device virtual CPU mesh, not the
ambient TPU plugin (see pytest.ini / conftest.py)."""


def test_platform():
    import jax

    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8
