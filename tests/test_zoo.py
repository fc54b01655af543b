"""Coverage for the less-traveled inventory: the SNGAN/DCGAN discriminator
zoo (dead code in the reference pipeline, kept for parity — SURVEY.md §2.8),
the --spec_norm_G path, and the .txt geological-grid dataset format."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infinite_texture_gans_tpu.models.discriminator import (
    DCDiscriminator,
    ResDiscriminator,
    SNDiscriminator,
)
from infinite_texture_gans_tpu.models.generator import ResidualPatchGenerator


def test_res_discriminator_unconditional():
    d = ResDiscriminator(base_ch=8, att=True, SN=True)
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    variables = jax.jit(lambda x: d.init(jax.random.key(1), x, train=True))(x)
    out, _ = jax.jit(
        lambda v, x: d.apply(v, x, train=True, update_sn=True, mutable=["spectral", "batch_stats"])
    )(variables, x)
    assert out.shape == (2, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_dc_discriminator():
    d = DCDiscriminator(base_ch=8, n_layers=3)
    x = jax.random.normal(jax.random.key(0), (2, 64, 64, 3))
    variables = jax.jit(lambda x: d.init(jax.random.key(1), x, train=True))(x)
    out, _ = jax.jit(
        lambda v, x: d.apply(v, x, train=True, mutable=["batch_stats"])
    )(variables, x)
    assert out.shape == (2 * 3,) or out.ndim == 1
    assert np.isfinite(np.asarray(out)).all()


def test_sn_discriminator():
    d = SNDiscriminator(base_ch=8, SN=True)
    x = jax.random.normal(jax.random.key(0), (2, 64, 64, 3))
    variables = jax.jit(lambda x: d.init(jax.random.key(1), x))(x)
    out, _ = jax.jit(
        lambda v, x: d.apply(v, x, update_sn=True, mutable=["spectral"])
    )(variables, x)
    assert out.shape == (2, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_generator_with_spectral_norm():
    """--spec_norm_G exists and works in the reference (never used by the
    README recipes, SURVEY.md §2.8); the SN path must run and keep its
    power-iteration state."""
    gen = ResidualPatchGenerator(
        z_dim=8, G_ch=8, base_res=4, n_layers_G=4, attention=True, img_ch=3,
        type_norm="BN", padding_mode="local", SN=True,
    )
    z = jax.random.normal(jax.random.key(0), (1, 14, 14, 8))
    variables = jax.jit(lambda z: gen.init(jax.random.key(1), z, train=True))(z)
    assert "spectral" in variables
    (out, _), upd = jax.jit(
        lambda v, z: gen.apply(
            v, z, train=True, update_sn=True, mutable=["batch_stats", "spectral"]
        )
    )(variables, z)
    assert out.shape == (1, 96, 96, 3)
    u0 = jax.tree_util.tree_leaves(variables["spectral"])[0]
    u1 = jax.tree_util.tree_leaves(upd["spectral"])[0]
    assert float(jnp.abs(u0 - u1).max()) > 0  # power iteration advanced


def test_txt_grid_dataset(tmp_path):
    """Whitespace-separated binary grid files (geological images,
    reference datasets_classes.py:21-23)."""
    from infinite_texture_gans_tpu.data.datasets import SingleImageDataset

    rng = np.random.default_rng(0)
    grid = (rng.random((64, 72)) > 0.5).astype(np.float32)
    path = tmp_path / "geo.txt"
    np.savetxt(path, grid, fmt="%.0f")
    ds = SingleImageDataset(str(path), ext="txt", random_crop=32, sampling=6)
    assert len(ds) == 6
    assert ds.img_ch == 1
    b = ds.sample_batch(np.random.default_rng(1), 3)
    assert b.shape == (3, 32, 32, 1)
    assert set(np.unique(b)).issubset({-1.0, 1.0})
