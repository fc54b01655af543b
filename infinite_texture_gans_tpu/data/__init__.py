from infinite_texture_gans_tpu.data.datasets import (
    SingleImageDataset,
    MultipleImagesDataset,
    Prefetcher,
    prepare_data,
)
