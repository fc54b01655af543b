"""Guard: the suite must run on the 8-device virtual CPU mesh, not the
ambient TPU plugin (see pytest.ini / conftest.py)."""


def test_platform():
    import jax

    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8


def test_compilation_cache_dir_routing():
    """Accelerator executables live in the SHARED cache dir (host-
    independent — they must survive machine migration); XLA:CPU compiles
    are routed to the per-host dir (their AOT executables embed host CPU
    features and SIGABRT on a weaker host). cpu_cache_scope/
    use_host_keyed_cache only act when the shared dir is active, so test/
    env overrides stay put."""
    import jax

    import infinite_texture_gans_tpu as pkg

    orig = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", pkg._SHARED_CACHE_DIR)
        with pkg.cpu_cache_scope():
            assert jax.config.jax_compilation_cache_dir == pkg.host_cache_dir()
        assert jax.config.jax_compilation_cache_dir == pkg._SHARED_CACHE_DIR
        pkg.use_host_keyed_cache()
        assert jax.config.jax_compilation_cache_dir == pkg.host_cache_dir()

        # overridden dir (tests, JAX_COMPILATION_CACHE_DIR): both are no-ops
        jax.config.update("jax_compilation_cache_dir", "/tmp/itg_custom_cache")
        with pkg.cpu_cache_scope():
            assert jax.config.jax_compilation_cache_dir == "/tmp/itg_custom_cache"
        pkg.use_host_keyed_cache()
        assert jax.config.jax_compilation_cache_dir == "/tmp/itg_custom_cache"
    finally:
        jax.config.update("jax_compilation_cache_dir", orig)
        try:
            from jax._src.compilation_cache import reset_cache

            reset_cache()
        except Exception:
            pass


def test_atomic_cache_put_roundtrip(tmp_path):
    """The package patches jax's LRUCache.put to write atomically (tmp +
    os.replace) — a process killed mid-write must not leave a truncated
    entry that poisons every later load (round-4 Fatal-Aborted incidents).
    Normal put/get must round-trip and leave no tmp files behind."""
    import infinite_texture_gans_tpu  # noqa: F401  (applies the patch)
    from jax._src.lru_cache import LRUCache

    c = LRUCache(str(tmp_path), max_size=-1)
    c.put("k1", b"payload-bytes")
    assert c.get("k1") == b"payload-bytes"
    c.put("k1", b"other")  # existing entries are not overwritten
    assert c.get("k1") == b"payload-bytes"
    leftovers = [p for p in tmp_path.iterdir() if ".tmp." in p.name]
    assert leftovers == []
