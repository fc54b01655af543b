from infinite_texture_gans_tpu.models.generator import (
    ResidualPatchGenerator,
    generator_site_specs,
)
from infinite_texture_gans_tpu.models.discriminator import (
    PatchDiscriminator,
    ResDiscriminator,
    DCDiscriminator,
    SNDiscriminator,
)

__all__ = [
    "ResidualPatchGenerator",
    "generator_site_specs",
    "PatchDiscriminator",
    "ResDiscriminator",
    "DCDiscriminator",
    "SNDiscriminator",
]
